"""Capture + analyze a device trace of one production seeding dispatch.

Runs the production resolved seeding jit under jax.profiler, then parses the
resulting trace.json.gz and prints the top device ops by total time — the
fusion-level breakdown that names the scan's hot spots (VERDICT r4 weak #3:
no device-efficiency number existed).

    python tools/analyze_trace.py [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(trace_dir: str, reps: int = 3):
    import jax
    import jax.numpy as jnp

    from bench import ensure_assets
    from kart_tpu.index import load_index
    from kart_tpu.pipeline.mapper import KartMapper, _bucket, _L_BUCKETS
    from kart_tpu.ops.pack import pack_reads_2bit, kmer_seed_scan_resolved_packed

    prefix, r1, r2 = ensure_assets()
    gidx = load_index(prefix)
    mapper = KartMapper(gidx)
    tb = mapper._get_kmer_tables()
    assert tb is not None

    B, l_max = 32000, _bucket(150, _L_BUCKETS)
    from kart_tpu.io.fastq import ReadStream, next_chunk

    s1, s2 = ReadStream(r1, True), ReadStream(r2, True)
    reads_i8 = np.full((B, l_max), 4, dtype=np.int8)
    rl = np.zeros(B, np.int32)
    row = 0
    while row < B:
        c = next_chunk(s1, s2, True, False)
        for r in c[: B - row]:
            enc = mapper._encode(r.seq)
            reads_i8[row, : len(enc)] = enc[:l_max]
            rl[row] = len(enc)
            row += 1
    s1.close(); s2.close()

    words, amb_r, amb_p = pack_reads_2bit(reads_i8)
    words_d, ar_d, ap_d = jnp.asarray(words), jnp.asarray(amb_r), jnp.asarray(amb_p)
    rl_d = jnp.asarray(rl)
    msl = np.int32(mapper.min_seed_len)
    max_seeds = l_max // (mapper.min_seed_len + 1) + 1
    hit_cap = int(max(16, 1 << int(np.ceil(np.log2(tb.max_mult + 1)))))

    def go():
        return kmer_seed_scan_resolved_packed(
            tb.table_lo, tb.text_words, tb.sa_full, tb.sub_tbl,
            words_d, ar_d, ap_d, rl_d, msl,
            max_seeds=max_seeds, l_max=l_max, hit_cap=hit_cap,
            rounds=l_max // 10 + 4, seq_len=tb.seq_len,
            occ_budget=mapper._occ_budget(B, l_max))

    np.asarray(go()[:1])  # compile + warm
    jax.profiler.start_trace(trace_dir)
    for _ in range(reps):
        out = go()
    np.asarray(out[:1])
    jax.profiler.stop_trace()
    return reps


def analyze(trace_dir: str, top: int, reps: int):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace.json.gz found under", trace_dir, file=sys.stderr)
        return 1
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-lane complete events: pid/tid whose thread name mentions TensorFlow
    # Op / XLA Ops lanes; fall back to any 'X' event with a dur
    by_name = defaultdict(float)
    n_by_name = defaultdict(int)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        cat = str(ev.get("cat", ""))
        args = ev.get("args") or {}
        lane = str(args.get("group_id", "")) + cat
        if name.startswith(("process_", "Steal", "thread")):
            continue
        by_name[name] += ev["dur"]
        n_by_name[name] += 1
        total += ev["dur"]
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'us_total':>12} {'calls':>7} {'us/rep':>10}  op")
    for name, us in rows:
        print(f"{us:12.0f} {n_by_name[name]:7d} {us / reps:10.1f}  {name[:110]}")
    print(f"# grand total {total:.0f} us over {reps} reps "
          f"({total / reps / 1e3:.1f} ms/rep, includes host lanes)")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()
    d = args.dir or tempfile.mkdtemp(prefix="kart_trace_")
    reps = capture(d, args.reps)
    sys.exit(analyze(d, args.top, reps))
