"""Diploid wgsim-equivalent simulator semantics (tools/simulate_reads.py;
reference: wgsim/wgsim.c:107-165, 243-454)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from simulate_reads import _apply_haplotype, _mutate_diploid, simulate  # noqa: E402

from conftest import make_genome  # noqa: E402


def test_no_mutation_reads_match_reference(workdir):
    fa = workdir / "sim0.fa"
    rng = np.random.default_rng(5)
    fa.write_text(make_genome(rng, [30000], n_runs=0))
    r1, r2 = workdir / "sim0_r1.fq", workdir / "sim0_r2.fq"
    simulate(str(fa), str(r1), str(r2), n_reads=200, read_len=100, err=0.0,
             mut=0.0, seed=3)
    from kart_tpu.index.format import parse_fasta

    g = parse_fasta(str(fa))[0].seq
    gs = bytes(g)
    lines = r1.read_text().splitlines()
    assert len(lines) == 4 * 100
    for i in range(0, len(lines), 4):
        pos = int(lines[i].split("Pos=")[1].split("\t")[0]) - 1
        assert gs[pos : pos + 100] == lines[i + 1].encode(), lines[i]


def test_diploid_mutation_model():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    g = rng.choice(bases, size=200000)
    sub, dele, ins = _mutate_diploid(g, rng, mut=0.01, indel_frac=0.3,
                                     indel_extend=0.5, haploid=False)
    # heterozygous substitutions must exist on both haplotypes and differ
    s0, s1 = sub[0] != 0xFF, sub[1] != 0xFF
    hom = int((s0 & s1).sum())
    het = int((s0 ^ s1).sum())
    assert hom > 0 and het > 0
    # wgsim hom fraction is 1/3 (wgsim.c:121): loose 3-sigma band
    frac = hom / (hom + het)
    assert 0.2 < frac < 0.5, frac
    # deletions extend geometrically: some multi-base runs
    d0 = dele[0].astype(np.int8)
    runs = np.diff(np.nonzero(np.diff(np.concatenate([[0], d0, [0]])))[0])[::2]
    assert runs.max() >= 2, "no extended deletion at indel_extend=0.5"
    # insertions are 1..4 bp (wgsim packs insertions into 4 2-bit slots)
    lens = [len(v) for v in ins.values()]
    assert lens and max(lens) <= 4 and min(lens) >= 1
    assert any(l > 1 for l in lens), "no extended insertion"
    # het insertions exist
    keys = set(ins)
    het_ins = [
        (h, p) for (h, p) in keys if (1 - h, p) not in keys
    ]
    assert het_ins


def test_haplotype_coordinate_map():
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    g = rng.choice(bases, size=50000)
    sub, dele, ins = _mutate_diploid(g, rng, mut=0.02, indel_frac=0.4,
                                     indel_extend=0.5, haploid=False)
    for hap in (0, 1):
        hs, coord = _apply_haplotype(g, sub, dele, ins, hap)
        # every kept, unsubstituted site must map to the same base
        keep = (~dele[hap]) & (sub[hap] == 0xFF)
        idx = np.nonzero(keep)[0][::97]
        np.testing.assert_array_equal(hs[coord[idx]], g[idx])
        # length bookkeeping: emitted bases + insertions
        exp_len = int((~dele[hap]).sum()) + sum(
            len(v) for (h, _), v in ins.items() if h == hap
        )
        assert len(hs) == exp_len
