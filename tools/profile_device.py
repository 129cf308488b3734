"""Stage-level profile of the production device pipeline on the real chip.

Times each stage of one KART_SEED_MODE=device dispatch group (G fused
4000-read chunks, the steady-state unit of mapper._map_stream_device) in
isolation, so "where do the ~N ms per group go" is answerable with numbers
instead of ratios (VERDICT r4 weak #3):

  encode     host C++ FASTQ->codes encode of the group
  pack       host 2-bit packing (ops/pack.pack_reads_2bit)
  h2d        relay upload of the packed words
  scan       device seeding scan only (kmer funnel or FM stepper)
  scan+res   production jit: scan + occurrence expansion + SA resolve +
             compaction (the extra vs `scan` is the resolve stage)
  d2h        materializing the resolved stream on host
  post       native C++ divide/conquer/pair/report/format of the group

Device-compute stages are timed by slope: t(N reps) - t(1 rep) over N-1,
with one 4-byte fetch to force completion (the axon relay's
block_until_ready is a no-op; a fetch pays ~30 ms fixed, which the slope
method cancels).  Run on the real chip:

    python tools/profile_device.py [--group 8] [--reps 5]

Prints a JSON stage table plus derived achieved-bandwidth numbers for the
table in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _fetch_tiny(arr):
    """Force completion of everything queued before `arr` with a minimal
    d2h (first 1 element)."""
    np.asarray(arr[:1])


def time_slope(fn, reps, fetch=_fetch_tiny):
    """Wall time per rep by slope: queue `reps` dispatches + one tiny
    fetch vs one dispatch + fetch. Returns (per_rep_s, t1_s)."""
    out = fn()
    fetch(out)  # warm/compile
    t0 = time.perf_counter()
    out = fn()
    fetch(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch(out)
    tn = time.perf_counter() - t0
    return max(tn - t1, 0.0) / max(reps - 1, 1), t1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=int(os.environ.get("KART_DEVICE_GROUP", "8")))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--engine", choices=["auto", "kmer", "fm", "fm_sampled"], default="auto",
                    help="seeding engine to profile (fm_sampled = human-scale shape)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import ensure_assets
    from kart_tpu.index import load_index
    from kart_tpu.pipeline.mapper import KartMapper, _bucket, _B_BUCKETS, _L_BUCKETS
    from kart_tpu.ops.pack import (
        pack_reads_2bit,
        kmer_seed_scan_packed,
        kmer_seed_scan_resolved_packed,
        seed_scan_packed,
        seed_scan_resolved_packed,
        unpack_stream,
    )

    prefix, r1, r2 = ensure_assets()
    gidx = load_index(prefix)
    if args.engine == "fm_sampled":
        os.environ["KART_SA_MODE"] = "sampled"
    mapper = KartMapper(gidx)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}", file=sys.stderr)

    # ---- build one steady-state group from the bench reads ----
    G = args.group
    chunk = 4000
    B = G * chunk
    l_max = _bucket(150, _L_BUCKETS)
    from kart_tpu.io.fastq import ReadStream, next_chunk

    s1, s2 = ReadStream(r1, True), ReadStream(r2, True)
    reads_i8 = np.full((B, l_max), 4, dtype=np.int8)
    rl = np.zeros(B, np.int32)
    row = 0
    while row < B:
        c = next_chunk(s1, s2, True, False)
        if not c:
            break
        for r in c[: B - row]:
            enc = mapper._encode(r.seq)
            reads_i8[row, : len(enc)] = enc[:l_max]
            rl[row] = len(enc)
            row += 1
    s1.close(); s2.close()
    assert row == B

    msl = np.int32(mapper.min_seed_len)
    budget = mapper._occ_budget(B, l_max)
    max_seeds = l_max // (mapper.min_seed_len + 1) + 1
    stages: dict[str, float] = {}
    reps = args.reps

    # ---- host stages ----
    t0 = time.perf_counter()
    for _ in range(reps):
        words, amb_r, amb_p = pack_reads_2bit(reads_i8)
    stages["pack_host"] = (time.perf_counter() - t0) / reps

    # h2d: upload the packed words (fresh array each time to defeat caching)
    t0 = time.perf_counter()
    for i in range(reps):
        w = words.copy()
        w[0, 0] ^= np.uint32(i + 1)
        d = jnp.asarray(w)
        _fetch_tiny(d)
    stages["h2d_words"] = (time.perf_counter() - t0) / reps
    words_d = jnp.asarray(words)
    amb_r_d, amb_p_d = jnp.asarray(amb_r), jnp.asarray(amb_p)
    rl_d = jnp.asarray(rl)

    tb = mapper._get_kmer_tables() if args.engine in ("auto", "kmer") else None
    use_kmer = tb is not None
    sa_mode = mapper._device_sa_mode()
    if use_kmer:
        hit_cap = int(max(16, 1 << int(np.ceil(np.log2(tb.max_mult + 1)))))
        rounds = l_max // 10 + 4
        scan_fn = lambda: kmer_seed_scan_packed(
            tb.table_lo, tb.text_words, tb.sa_full, tb.sub_tbl,
            words_d, amb_r_d, amb_p_d, rl_d, msl,
            max_seeds=max_seeds, l_max=l_max, hit_cap=hit_cap, rounds=rounds,
            seq_len=tb.seq_len)
        res_fn = lambda: kmer_seed_scan_resolved_packed(
            tb.table_lo, tb.text_words, tb.sa_full, tb.sub_tbl,
            words_d, amb_r_d, amb_p_d, rl_d, msl,
            max_seeds=max_seeds, l_max=l_max, hit_cap=hit_cap, rounds=rounds,
            seq_len=tb.seq_len, occ_budget=budget)
    else:
        fm = mapper.fm_dev
        scan_fn = lambda: seed_scan_packed(
            fm, words_d, amb_r_d, amb_p_d, rl_d, msl,
            max_seeds=max_seeds, l_max=l_max)
        res_fn = lambda: seed_scan_resolved_packed(
            fm, words_d, amb_r_d, amb_p_d, rl_d, msl,
            max_seeds=max_seeds, l_max=l_max, occ_budget=budget,
            sa_mode=sa_mode)

    stages["scan_dev"], t1_scan = time_slope(scan_fn, reps)
    stages["scan_resolve_dev"], t1_res = time_slope(res_fn, reps)
    stages["resolve_delta_dev"] = stages["scan_resolve_dev"] - stages["scan_dev"]

    # d2h of the production stream (fused (B+2H,) int32 array)
    out = res_fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        stream = np.asarray(out) if not isinstance(out, tuple) else tuple(np.asarray(x) for x in out)
    stages["d2h_stream"] = (time.perf_counter() - t0) / reps
    nbytes = out.size * 4 if not isinstance(out, tuple) else sum(x.size * x.dtype.itemsize for x in out)

    # native post: the C++ back half on the resolved stream
    if mapper.native is not None:
        cnts, meta, gpos = unpack_stream(out, B, budget)
        from kart_tpu.ops.resolve import decode_resolved_counts

        ok, tot, offs = decode_resolved_counts(cnts)
        rpos = (meta & 0xFFFF).astype(np.int32)
        slen = ((meta >> 16) & 0xFFFF).astype(np.int32)
        res = (tot, offs, rpos, slen, gpos, {})
        # rebuild raw chunk lists for process_chunk (header/seq/qual strings)
        s1, s2 = ReadStream(r1, True), ReadStream(r2, True)
        chunks = []
        rowc = 0
        while rowc < B:
            c = next_chunk(s1, s2, True, False)
            chunks.append(c)
            rowc += len(c)
        s1.close(); s2.close()
        t0 = time.perf_counter()
        rowc = 0
        for c in chunks:
            n0 = len(c)
            cnt, rp, ln, gp = mapper._chunk_flat(res, rowc, rowc + n0)
            mapper.native.process_chunk(c, True, True, cnt, rp, ln, gp, mapper.stats)
            rowc += n0
        stages["post_native"] = time.perf_counter() - t0

    per_read_us = {k: 1e6 * v / B for k, v in stages.items()}
    derived = {
        "B": B, "l_max": l_max, "engine": "kmer" if use_kmer else f"fm/{sa_mode}",
        "stream_bytes": int(nbytes),
        "d2h_MBps": round(nbytes / max(stages["d2h_stream"], 1e-9) / 1e6, 1),
        "group_reads_per_sec_scan_resolve_only": round(B / max(stages["scan_resolve_dev"], 1e-9), 1),
        "serial_host_per_group_ms": round(1e3 * (stages["pack_host"] + stages["d2h_stream"]), 1),
    }
    print(json.dumps({"stages_s": {k: round(v, 5) for k, v in stages.items()},
                      "per_read_us": {k: round(v, 3) for k, v in per_read_us.items()},
                      "derived": derived}, indent=1))


if __name__ == "__main__":
    main()
