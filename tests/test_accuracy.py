"""Precision/recall harness (SURVEY.md section-4: the wgsim +
SamEvaluation methodology): simulate mutated reads, map, score positions
against the truth encoded in read names, and require parity with the
reference aligner's accuracy on the same reads."""

import subprocess
import sys
from pathlib import Path

import pytest

from conftest import REFBUILD, needs_reference, run_reference_indexer

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


@pytest.fixture(scope="module")
def acc_fixture(workdir, small_genome):
    from kart_tpu.index import build_index, index_files_exist

    prefix = workdir / "small_idx"
    if not index_files_exist(str(prefix)):
        build_index(str(small_genome), str(prefix), verbose=False)
    r1 = workdir / "acc_r1.fq"
    r2 = workdir / "acc_r2.fq"
    from simulate_reads import simulate

    simulate(str(small_genome), str(r1), str(r2), n_reads=2000, read_len=125,
             err=0.015, mut=0.002, seed=99)
    return prefix, r1, r2


def _score(sam_path):
    from evaluate_sam import evaluate

    return evaluate(str(sam_path))


def test_accuracy_illumina_pe(acc_fixture, workdir):
    from kart_tpu import cli as kart_cli

    prefix, r1, r2 = acc_fixture
    out = workdir / "acc_our.sam"
    rc = kart_cli.main(
        ["kart-tpu", "-i", str(prefix), "-f", str(r1), "-f2", str(r2),
         "-o", str(out), "-silent"]
    )
    assert rc == 0
    m = _score(out)
    # mates share a header; the evaluator (like the reference SamEvaluation)
    # scores one record per unique header
    assert m["reads"] == 1000
    # 1.5% base error + 0.2% mutations on a 100kb genome: essentially
    # everything should map and be placed correctly
    assert m["mapped"] / m["reads"] >= 0.98, m
    assert m["precision"] >= 98.0, m
    assert m["recall"] >= 97.0, m


@needs_reference
def test_accuracy_matches_reference(acc_fixture, workdir, small_genome):
    """Same reads through the reference binary: identical accuracy."""
    prefix, r1, r2 = acc_fixture
    ref_prefix = workdir / "acc_refidx"
    if not (workdir / "acc_refidx.bwt").exists():
        run_reference_indexer(small_genome, ref_prefix)
    ref_out = workdir / "acc_ref.sam"
    subprocess.run(
        [str(REFBUILD / "bin" / "kart"), "-t", "1", "-i", str(ref_prefix),
         "-f", str(r1), "-f2", str(r2), "-o", str(ref_out)],
        check=True, capture_output=True,
    )
    ours = _score(workdir / "acc_our.sam")
    ref = _score(ref_out)
    assert ours == ref, (ours, ref)
