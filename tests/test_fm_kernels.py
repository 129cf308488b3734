"""Batched FM-search kernels vs the host reference model."""

import numpy as np
import pytest

from kart_tpu.index import build_index, load_index
from kart_tpu.ops.fm_ref import fm_from_genome_index, identify_seed_pairs_fast
from kart_tpu.ops.fm_search import FMIndexArrays, sa_resolve_full, sa_walk, seed_scan, unpack_seed_scan

from conftest import make_genome


@pytest.fixture(scope="module")
def tiny_index(workdir):
    rng = np.random.default_rng(5)
    fa = workdir / "fmtest.fa"
    fa.write_text(make_genome(rng, [20000], n_runs=0))
    prefix = workdir / "fmtest_idx"
    build_index(str(fa), str(prefix), verbose=False)
    return load_index(str(prefix))


def simulate_reads(gidx, n, rlen, err=0.02, seed=3):
    rng = np.random.default_rng(seed)
    codes = gidx.ref_codes
    reads = np.empty((n, rlen), dtype=np.int32)
    for i in range(n):
        p = rng.integers(0, gidx.two_genome_size - rlen)
        r = codes[p : p + rlen].astype(np.int32)
        nmut = rng.binomial(rlen, err)
        idx = rng.integers(0, rlen, size=nmut)
        r[idx] = (r[idx] + rng.integers(1, 4, size=nmut)) % 4
        # occasional ambiguous base
        if rng.random() < 0.3:
            r[rng.integers(0, rlen)] = 4
        reads[i] = r
    return reads


def test_occ4_and_sa_vs_ref(tiny_index):
    fm_ref = fm_from_genome_index(tiny_index)
    fm_dev = FMIndexArrays.from_genome_index(tiny_index)
    from kart_tpu.ops.fm_search import occ4 as occ4_dev
    import jax

    rng = np.random.default_rng(0)
    ks = rng.integers(0, tiny_index.seq_len + 1, size=200).astype(np.int32)
    got = jax.vmap(lambda k: occ4_dev(fm_dev, k))(ks)
    for j, k in enumerate(ks):
        np.testing.assert_array_equal(np.asarray(got[j]), fm_ref.occ4(int(k)), err_msg=f"k={k}")

    rows = rng.integers(1, tiny_index.seq_len + 1, size=100).astype(np.int32)
    pos, done = sa_walk(fm_dev, rows)
    assert bool(np.all(np.asarray(done)))
    pos = np.asarray(pos)
    full = np.asarray(sa_resolve_full(fm_dev.sa_full, rows))
    np.testing.assert_array_equal(pos, full)  # walk == full-SA gather
    for j, r in enumerate(rows[:40]):
        assert pos[j] == fm_ref.sa_lookup(int(r)), f"row {r}"


def test_seed_scan_matches_reference_model(tiny_index):
    fm_ref = fm_from_genome_index(tiny_index)
    fm_dev = FMIndexArrays.from_genome_index(tiny_index)
    min_seed = 13
    rlen = 120
    reads = simulate_reads(tiny_index, 32, rlen)
    rlens = np.full(32, rlen, dtype=np.int32)

    ms = rlen // (min_seed + 1) + 1
    out = unpack_seed_scan(
        np.asarray(
            seed_scan(fm_dev, reads, rlens, np.int32(min_seed), max_seeds=ms, l_max=rlen)
        ),
        ms,
    )
    n_seeds = np.asarray(out["n_seeds"])
    rpos = np.asarray(out["rpos"])
    slen = np.asarray(out["slen"])
    k0 = np.asarray(out["k0"])
    freq = np.asarray(out["freq"])

    for i in range(32):
        expected = identify_seed_pairs_fast(fm_ref, reads[i], min_seed)
        got = []
        for s in range(n_seeds[i]):
            rows = k0[i, s] + np.arange(freq[i, s], dtype=np.int32)
            locs = np.asarray(sa_resolve_full(fm_dev.sa_full, rows.astype(np.int32)))
            for loc in locs:
                got.append((int(rpos[i, s]), int(slen[i, s]), int(loc)))
        assert got == expected, f"read {i}"


def test_seed_scan_variable_lengths(tiny_index):
    """Reads shorter than l_max padded with 4s behave like their true length."""
    fm_ref = fm_from_genome_index(tiny_index)
    fm_dev = FMIndexArrays.from_genome_index(tiny_index)
    min_seed = 13
    l_max = 100
    rng = np.random.default_rng(11)
    lens = np.array([40, 77, 100, 14], dtype=np.int32)
    codes = tiny_index.ref_codes
    reads = np.full((4, l_max), 4, dtype=np.int32)
    for i, L in enumerate(lens):
        p = rng.integers(0, tiny_index.two_genome_size - int(L))
        reads[i, :L] = codes[p : p + L]
    out = unpack_seed_scan(
        np.asarray(seed_scan(fm_dev, reads, lens, np.int32(min_seed), max_seeds=8, l_max=l_max)),
        8,
    )
    for i, L in enumerate(lens):
        expected = identify_seed_pairs_fast(fm_ref, reads[i, :L], min_seed)
        got = []
        for s in range(int(out["n_seeds"][i])):
            rows = int(out["k0"][i, s]) + np.arange(int(out["freq"][i, s]))
            locs = np.asarray(sa_resolve_full(fm_dev.sa_full, rows.astype(np.int32)))
            got += [(int(out["rpos"][i, s]), int(out["slen"][i, s]), int(l)) for l in locs]
        assert got == expected, f"read {i} len {L}"


def _simulate_long_reads(gidx, n, lens, err=0.10, seed=9):
    """PacBio-like reads: substitutions + indels at `err` total rate."""
    rng = np.random.default_rng(seed)
    codes = gidx.ref_codes
    reads = []
    for i in range(n):
        L = int(lens[i % len(lens)])
        p = rng.integers(0, gidx.two_genome_size - 2 * L)
        frag = list(codes[p : p + int(L * 1.2)].astype(np.int32))
        out = []
        j = 0
        while j < len(frag) and len(out) < L:
            r = rng.random()
            if r < err * 0.5:  # substitution
                out.append(int((frag[j] + rng.integers(1, 4)) % 4))
                j += 1
            elif r < err * 0.75:  # deletion from read
                j += 1
            elif r < err:  # insertion into read
                out.append(int(rng.integers(0, 4)))
            else:
                out.append(int(frag[j]))
                j += 1
        while len(out) < L:
            out.append(int(rng.integers(0, 4)))
        reads.append(np.array(out[:L], dtype=np.int32))
    return reads


def test_sensitive_scan_matches_host(tiny_index):
    """Device SensitiveMode seeding == host BWT_Search walk (reference
    semantics: 30bp window, restart-at-end on success, MinSeedLength jump
    from seed start on failure incl. the freq>OCC_Thr rewind case)."""
    import jax.numpy as jnp

    from kart_tpu.ops.fm_search import sensitive_scan
    from kart_tpu.pipeline.mapper import KartMapper

    min_seed = 13
    fm_dev = FMIndexArrays.from_genome_index(tiny_index)
    mapper = KartMapper(tiny_index, pacbio=True, use_device=False, backend="python")

    lens = [220, 300, 410]
    enc_reads = _simulate_long_reads(tiny_index, 12, lens)
    # add an ambiguous-base read and an all-random read
    enc_reads[3][50:55] = 4
    rng = np.random.default_rng(1)
    enc_reads[7] = rng.integers(0, 4, size=len(enc_reads[7])).astype(np.int32)

    l_max = max(len(e) for e in enc_reads)
    B = len(enc_reads)
    reads = np.full((B, l_max), 4, dtype=np.int32)
    rlens = np.zeros(B, np.int32)
    for i, e in enumerate(enc_reads):
        reads[i, : len(e)] = e
        rlens[i] = len(e)
    max_seeds = l_max // min_seed + 2

    packed = np.asarray(
        sensitive_scan(
            fm_dev,
            jnp.asarray(reads),
            jnp.asarray(rlens),
            jnp.int32(min_seed),
            max_seeds=max_seeds,
            l_max=l_max,
        )
    )
    out = unpack_seed_scan(packed, max_seeds)
    sa_full = np.asarray(fm_dev.sa_full)

    for i, enc in enumerate(enc_reads):
        want = mapper._seed_sensitive_flat(enc)  # [(rpos, len, gpos)...]
        got = []
        for t in range(int(out["n_seeds"][i])):
            rp, ln = int(out["rpos"][i][t]), int(out["slen"][i][t])
            k0, fq = int(out["k0"][i][t]), int(out["freq"][i][t])
            for o in range(fq):
                got.append((rp, ln, int(sa_full[k0 + o])))
        assert got == want, f"read {i}: {got[:5]} vs {want[:5]}"


def test_kmer_seed_scan_matches_fm_long_reads(tiny_index):
    """Direct-lookup kmer engine == FM reference seeds, including reads
    whose exact match exceeds 192 bases (ADVICE r3: a fixed funnel width
    W=13 silently saturated the extension at (W-1)*16 = 192 bases; W is
    now derived from l_max)."""
    from kart_tpu.ops.kmer_seed import build_tables, kmer_seed_scan, unpack_seed_result

    tb = build_tables(tiny_index)
    assert tb.all_short_present and tb.max_mult <= 4096
    fm_ref = fm_from_genome_index(tiny_index)
    min_seed = 13
    l_max = 256
    rng = np.random.default_rng(42)
    codes = tiny_index.ref_codes
    B = 16
    reads = np.full((B, l_max), 4, dtype=np.int32)
    rlens = np.full(B, l_max, dtype=np.int32)
    for i in range(B):
        p = rng.integers(0, tiny_index.two_genome_size - l_max)
        r = codes[p : p + l_max].astype(np.int32)
        if i % 4 == 1:  # one early mismatch, then a >200bp exact tail
            r[20] = (r[20] + 1) % 4
        elif i % 4 == 2:  # scattered errors
            idx = rng.integers(0, l_max, size=5)
            r[idx] = (r[idx] + rng.integers(1, 4, size=5)) % 4
        elif i % 4 == 3:  # ambiguous base mid-read
            r[130] = 4
        reads[i] = r  # i%4==0: fully exact 256bp read
    hit_cap = int(min(128, max(16, 1 << int(np.ceil(np.log2(tb.max_mult + 1))))))
    max_seeds = l_max // (min_seed + 1) + 1
    packed = np.asarray(
        kmer_seed_scan(
            tb.table_lo, tb.text_words, tb.sa_full, tb.sub_tbl,
            reads, rlens, np.int32(min_seed),
            max_seeds=max_seeds, l_max=l_max, hit_cap=hit_cap,
            rounds=l_max // 10 + 4, seq_len=tb.seq_len,
        )
    )
    out = unpack_seed_result(packed, max_seeds)
    sa_full = tb.sa_full_np
    assert out["ok"].all(), "no lane should overflow on this workload"
    saw_long = False
    for i in range(B):
        expected = identify_seed_pairs_fast(fm_ref, reads[i], min_seed)
        got = []
        for s in range(int(out["n_seeds"][i])):
            rp, ln = int(out["rpos"][i][s]), int(out["slen"][i][s])
            k0, fq = int(out["k0"][i][s]), int(out["freq"][i][s])
            saw_long = saw_long or ln > 192
            for o in range(fq):
                got.append((rp, ln, int(sa_full[k0 + o])))
        assert got == expected, f"read {i}: {got[:4]} vs {expected[:4]}"
    assert saw_long, "workload must exercise extensions beyond 192 bases"


def test_kmer_table_sidecar_cache(tiny_index, workdir):
    """.kmt sidecar round-trips the direct-lookup tables exactly."""
    import os

    from kart_tpu.ops.kmer_seed import build_tables

    kmt = tiny_index.raw.prefix + ".kmt"
    if os.path.exists(kmt):
        os.remove(kmt)
    fresh = build_tables(tiny_index)  # builds and writes the sidecar
    assert os.path.exists(kmt)
    cached = build_tables(tiny_index)  # loads the sidecar
    np.testing.assert_array_equal(cached.table_lo_np, fresh.table_lo_np)
    np.testing.assert_array_equal(cached.text_np, fresh.text_np)
    for a, b in zip(cached.bitmaps_np, fresh.bitmaps_np):
        np.testing.assert_array_equal(a, b)
    assert (cached.seq_len, cached.max_mult, cached.all_short_present) == (
        fresh.seq_len, fresh.max_mult, fresh.all_short_present,
    )


def test_kmer_sensitive_scan_matches_fm_sensitive(tiny_index):
    """The direct-lookup SensitiveMode scan (kmer funnel with 30-bp window
    caps and sensitive advance rules) must emit exactly the seed stream of
    the FM sensitive_scan / host windowed BWT_Search chain — same seeds,
    same SA-interval starts, same occurrence counts."""
    from kart_tpu.ops.fm_search import sensitive_scan
    from kart_tpu.ops.kmer_seed import build_tables, kmer_seed_scan, unpack_seed_result

    fm_dev = FMIndexArrays.from_genome_index(tiny_index)
    tb = build_tables(tiny_index, cache=False)
    min_seed = 13
    rlen = 700
    n = 12
    rng = np.random.default_rng(11)
    codes = tiny_index.ref_codes
    reads = np.empty((n, rlen), np.int32)
    for i in range(n):
        p = rng.integers(0, tiny_index.two_genome_size - rlen)
        r = codes[p : p + rlen].astype(np.int32)
        nmut = rng.binomial(rlen, 0.15)  # PacBio-grade error
        idx = rng.integers(0, rlen, size=nmut)
        r[idx] = (r[idx] + rng.integers(1, 4, size=nmut)) % 4
        if i % 3 == 0:
            r[rng.integers(0, rlen, 4)] = 4  # ambiguity
        reads[i] = r
    rlens = np.full(n, rlen, np.int32)
    ms = rlen // min_seed + 2

    want = np.asarray(
        sensitive_scan(fm_dev, reads, rlens, np.int32(min_seed),
                       max_seeds=ms, l_max=rlen)
    )
    hit_cap = int(max(16, 1 << int(np.ceil(np.log2(tb.max_mult + 1)))))
    got_packed = np.asarray(
        kmer_seed_scan(
            tb.table_lo, tb.text_words, tb.sa_full, tb.sub_tbl,
            reads, rlens, np.int32(min_seed), max_seeds=ms, l_max=rlen,
            hit_cap=hit_cap, rounds=rlen // min_seed + 8,
            seq_len=tb.seq_len, sensitive=True,
        )
    )
    got = unpack_seed_result(got_packed, ms)
    from kart_tpu.ops.fm_search import unpack_seed_scan as ups

    w = ups(want, ms)
    ok = np.asarray(got["ok"])
    assert ok.all(), f"{(~ok).sum()} lanes flagged on a tiny clean genome"
    np.testing.assert_array_equal(got["n_seeds"], w["n_seeds"])
    for f in ("rpos", "slen", "k0", "freq"):
        np.testing.assert_array_equal(got[f], np.asarray(w[f]), err_msg=f)


def test_native_pack_matches_numpy():
    """kart_pack_reads_2bit (one-pass C++) must produce bit-identical
    words and ambiguity lists to the numpy packer across shapes, N
    densities, and the amb-bucket boundaries."""
    import kart_tpu.ops.pack as pk

    rng = np.random.default_rng(31)
    for B, L, n_amb in ((7, 150, 0), (64, 160, 5), (33, 97, 300),
                        (16, 33, 400), (4, 8192, 9000)):
        reads = rng.integers(0, 4, size=(B, L)).astype(np.int8)
        if n_amb:
            reads[rng.integers(0, B, n_amb), rng.integers(0, L, n_amb)] = 4
        native = pk._native_pack(reads, B, L, -(-L // 16))
        assert native is not None
        orig = pk._native_pack
        pk._native_pack = lambda *a: None
        try:
            ref = pk.pack_reads_2bit(reads)
        finally:
            pk._native_pack = orig
        for a, b, name in zip(native, ref, ("words", "amb_r", "amb_p")):
            np.testing.assert_array_equal(a, b, err_msg=f"{name} B={B} L={L}")


def test_stream_pack16_roundtrip():
    """_pack_stream(pack16=True) -> unpack_stream must reproduce the
    canonical (cnts, meta, gpos) exactly, including negative overflow-flag
    counts and boundary rpos/slen values."""
    import jax.numpy as jnp

    from kart_tpu.ops.pack import _pack_stream, unpack_stream

    rng = np.random.default_rng(3)
    B, H = 64, 192
    cnts = rng.integers(-601, 601, size=B).astype(np.int32)
    rpos = rng.integers(0, 244, size=H).astype(np.int32)
    slen = rng.integers(13, 257, size=H).astype(np.int32)
    rpos[0], slen[0] = 0, 13
    rpos[1], slen[1] = 243, 256
    cnts[0], cnts[1] = -601, 600
    meta = rpos | (slen << 16)
    gpos = rng.integers(0, 2**31 - 1, size=H).astype(np.int32)
    packed = np.asarray(
        _pack_stream(jnp.asarray(cnts), jnp.asarray(meta), jnp.asarray(gpos),
                     pack16=True)
    )
    assert packed.size == B // 2 + H // 2 + H  # -29% vs the 32-bit layout
    c2, m2, g2 = unpack_stream(packed, B, H, pack16=True)
    np.testing.assert_array_equal(c2, cnts)
    np.testing.assert_array_equal(m2, meta)
    np.testing.assert_array_equal(g2, gpos)
