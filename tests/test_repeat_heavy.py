"""Repeat-heavy genome golden parity.

Deep SA intervals (repeat families with hundreds of copies) exercise the
native seeder's binary maximal-extension block search
(kart_post.cpp ext_interval_bin — used when an interval exceeds
EXT_BIN_THR=48 rows) and the device kmer engine's hit compaction; random
test genomes never produce such intervals (max 13-mer multiplicity ~1), so
this genome implants them deliberately."""

import subprocess

import numpy as np
import pytest

from conftest import REFBUILD, needs_reference, run_reference_indexer

from kart_tpu.index import build_index, load_index


@pytest.fixture(scope="module")
def repeat_assets(workdir):
    rng = np.random.default_rng(404)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    L = 300_000
    seq = rng.choice(bases, size=L)

    def diverge(frag, rate):
        frag = frag.copy()
        n = rng.binomial(len(frag), rate)
        if n:
            idx = rng.integers(0, len(frag), size=n)
            frag[idx] = bases[rng.integers(0, 4, size=n)]
        return frag

    # 200-copy 60bp family (deep intervals well past EXT_BIN_THR) + a
    # 40-copy 400bp family + an exact 120-copy 30bp motif
    fam = rng.choice(bases, size=60)
    for _ in range(200):
        p = int(rng.integers(0, L - 60))
        seq[p : p + 60] = diverge(fam, 0.03)
    fam2 = rng.choice(bases, size=400)
    for _ in range(40):
        p = int(rng.integers(0, L - 400))
        seq[p : p + 400] = diverge(fam2, 0.01)
    motif = rng.choice(bases, size=30)
    for _ in range(120):
        p = int(rng.integers(0, L - 30))
        seq[p : p + 30] = motif
    fa = workdir / "repeat.fa"
    with open(fa, "wb") as f:
        f.write(b">rep\n")
        s = seq.tobytes()
        for j in range(0, len(s), 70):
            f.write(s[j : j + 70] + b"\n")
    prefix = workdir / "repeat_idx"
    build_index(str(fa), str(prefix), verbose=False)

    # PE reads, many drawn FROM the repeat copies so restarts land in the
    # deep intervals
    comp = np.zeros(256, np.uint8)
    comp[np.frombuffer(b"ACGT", np.uint8)] = np.frombuffer(b"TGCA", np.uint8)
    rl = 150
    r1, r2 = workdir / "rep_r1.fq", workdir / "rep_r2.fq"
    with open(r1, "wb") as f1, open(r2, "wb") as f2:
        for i in range(2000):
            ins = max(2 * rl, int(rng.normal(420, 40)))
            p = int(rng.integers(0, L - ins))
            frag = seq[p : p + ins].copy()
            idx = rng.integers(0, ins, size=rng.binomial(ins, 0.01))
            frag[idx] = bases[rng.integers(0, 4, size=len(idx))]
            fwd = frag[:rl].tobytes()
            rev = comp[frag[-rl:][::-1]].tobytes()
            q = b"I" * rl
            f1.write(b"@rp%d/1\n%s\n+\n%s\n" % (i, fwd, q))
            f2.write(b"@rp%d/2\n%s\n+\n%s\n" % (i, rev, q))
    return fa, prefix, r1, r2


def test_deep_intervals_exist(repeat_assets):
    _, prefix, _, _ = repeat_assets
    gidx = load_index(str(prefix))
    from kart_tpu.ops.kmer_seed import build_tables

    tb = build_tables(gidx)
    assert tb.max_mult > 48, (
        f"max 13-mer multiplicity {tb.max_mult} does not reach the binary "
        "extension threshold; the genome no longer exercises the fast path"
    )


@needs_reference
def test_repeat_heavy_golden_sam(repeat_assets, workdir, monkeypatch):
    fa, prefix, r1, r2 = repeat_assets
    run_reference_indexer(fa, workdir / "repeat_refidx")
    ref_sam = workdir / "repeat_ref.sam"
    subprocess.run(
        [str(REFBUILD / "bin" / "kart"), "-t", "1", "-i",
         str(workdir / "repeat_refidx"), "-f", str(r1), "-f2", str(r2),
         "-o", str(ref_sam)],
        check=True, capture_output=True,
    )

    from kart_tpu import cli as kart_cli

    def records(p):
        return [l for l in p.read_text().splitlines() if not l.startswith("@")]

    want = records(ref_sam)
    for tag, env in (
        ("native", {}),
        ("device", {"KART_SEED_MODE": "device"}),
    ):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        ours = workdir / f"repeat_{tag}.sam"
        assert kart_cli.main(
            ["kart-tpu", "-i", str(prefix), "-f", str(r1), "-f2", str(r2),
             "-o", str(ours), "-silent"]
        ) == 0
        assert records(ours) == want, tag
        for k in env:
            monkeypatch.delenv(k)
