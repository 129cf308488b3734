"""Golden-SAM equality vs the reference aligner across all mapping modes.

The north-star correctness criterion (BASELINE.md): bit-identical SAM,
including the header.  The reference binary is run single-threaded so its
chunk output order is deterministic."""

import gzip
import subprocess
from pathlib import Path

import numpy as np
import pytest

from conftest import REFBUILD, make_genome, needs_reference

from kart_tpu import cli as kart_cli

pytestmark = needs_reference

WGSIM = REFBUILD / "wgsim" / "wgsim"


# Bump when the fixture recipe below changes; also triggers a rebuild when
# any product is missing (a half-populated directory previously broke the
# suite — VERDICT r2 weak #6).
_GOLDEN_STAMP = "v2 seed=424 chroms=70000,30000 wgsim=400x100+30x1500"
_GOLDEN_PRODUCTS = (
    "g.fa", "r1.fq", "r2.fq", "pb1.fq", "pb2.fq",
    "idx.bwt", "idx.sa", "idx.pac", "idx.ann", "idx.amb",
)


@pytest.fixture(scope="module")
def golden(workdir):
    """Genome + reference index + simulated reads."""
    d = workdir / "golden"
    stamp = d / ".stamp"
    complete = (
        d.is_dir()
        and all((d / p).exists() for p in _GOLDEN_PRODUCTS)
        and stamp.exists()
        and stamp.read_text() == _GOLDEN_STAMP
    )
    if not complete:
        # Stale or partial: rebuild from scratch (derived files like r1.fq.gz
        # must not outlive the primaries they were made from).
        if d.exists():
            import shutil

            shutil.rmtree(d)
        d.mkdir()
        fa = d / "g.fa"
        rng = np.random.default_rng(424)
        fa.write_text(make_genome(rng, [70000, 30000], n_runs=2))
        subprocess.run(
            [str(REFBUILD / "bin" / "bwt_index"), str(fa), str(d / "idx")],
            check=True,
            capture_output=True,
        )
        subprocess.run(
            [str(WGSIM), "-N", "400", "-l", "100", "-e", "0.02", "-r", "0.005", "-R", "0.15",
             str(fa), str(d / "r1.fq"), str(d / "r2.fq")],
            check=True,
            capture_output=True,
        )
        subprocess.run(
            [str(WGSIM), "-N", "30", "-l", "1500", "-e", "0.10", "-r", "0.001",
             str(fa), str(d / "pb1.fq"), str(d / "pb2.fq")],
            check=True,
            capture_output=True,
        )
        stamp.write_text(_GOLDEN_STAMP)
    return d


def run_both(golden, ref_args, our_args, name):
    ref_out = golden / f"ref_{name}.sam"
    our_out = golden / f"our_{name}.sam"
    subprocess.run(
        [str(REFBUILD / "bin" / "kart"), "-t", "1", "-i", str(golden / "idx")]
        + ref_args
        + ["-o", str(ref_out)],
        check=True,
        capture_output=True,
    )
    rc = kart_cli.main(
        ["kart-tpu", "-i", str(golden / "idx")] + our_args + ["-o", str(our_out), "-silent"]
    )
    assert rc == 0
    a = ref_out.read_text()
    b = our_out.read_text()
    assert a == b, f"{name}: SAM differs"


def test_single_end(golden):
    run_both(golden, ["-f", str(golden / "r1.fq")], ["-f", str(golden / "r1.fq")], "se")


def test_paired_end(golden):
    args = ["-f", str(golden / "r1.fq"), "-f2", str(golden / "r2.fq")]
    run_both(golden, args, args, "pe")


def test_paired_end_multihit(golden):
    args = ["-f", str(golden / "r1.fq"), "-f2", str(golden / "r2.fq"), "-m"]
    run_both(golden, args, args, "pe_m")


def test_gzipped_input(golden):
    gz1 = golden / "r1.fq.gz"
    if not gz1.exists():
        gz1.write_bytes(gzip.compress((golden / "r1.fq").read_bytes()))
    run_both(golden, ["-f", str(gz1)], ["-f", str(gz1)], "gz")


def test_fasta_input(golden):
    fa_reads = golden / "r1.fa"
    if not fa_reads.exists():
        lines = (golden / "r1.fq").read_text().splitlines()
        out = []
        for i in range(0, len(lines), 4):
            out.append(">" + lines[i][1:])
            out.append(lines[i + 1])
        fa_reads.write_text("\n".join(out) + "\n")
    run_both(golden, ["-f", str(fa_reads)], ["-f", str(fa_reads)], "fa")


def test_interlaced_pairs(golden):
    inter = golden / "inter.fq"
    if not inter.exists():
        l1 = (golden / "r1.fq").read_text().splitlines()
        l2 = (golden / "r2.fq").read_text().splitlines()
        out = []
        for i in range(0, len(l1), 4):
            out += l1[i : i + 4] + l2[i : i + 4]
        inter.write_text("\n".join(out) + "\n")
    args = ["-p", "-f", str(inter)]
    run_both(golden, args, args, "inter")


def test_pacbio(golden):
    args = ["-pacbio", "-f", str(golden / "pb1.fq")]
    run_both(golden, args, args, "pb")


def test_max_gaps_flag(golden):
    args = ["-f", str(golden / "r1.fq"), "-g", "2"]
    run_both(golden, args, args, "g2")


def test_pacbio_device_seeding(golden):
    """PacBio path with batched DEVICE sensitive seeding (python pipeline)."""
    args = ["-pacbio", "-f", str(golden / "pb1.fq")]
    run_both(golden, args, args + ["-backend", "python"], "pb_dev")


def test_paired_end_device_seeding(golden):
    """Illumina PE with batched DEVICE FastMode seeding (python pipeline)."""
    args = ["-f", str(golden / "r1.fq"), "-f2", str(golden / "r2.fq")]
    run_both(golden, args, args + ["-backend", "python"], "pe_dev")


def test_paired_end_device_pipelined(golden, monkeypatch):
    """KART_SEED_MODE=device: TPU seeds chunk k+1 while native post runs
    chunk k (packed-seed handoff, occurrence expansion in C++)."""
    monkeypatch.setenv("KART_SEED_MODE", "device")
    args = ["-f", str(golden / "r1.fq"), "-f2", str(golden / "r2.fq")]
    run_both(golden, args, args, "pe_devpipe")


def test_pacbio_device_pipelined(golden, monkeypatch):
    monkeypatch.setenv("KART_SEED_MODE", "device")
    args = ["-pacbio", "-f", str(golden / "pb1.fq")]
    run_both(golden, args, args, "pb_devpipe")


def test_paired_end_batched_device_nw(golden, monkeypatch):
    """Batched device conquer: per-chunk NW fragments collected and run as
    one Pallas NW batch, report pass replays from the memo."""
    monkeypatch.setenv("KART_BATCH_NW", "1")
    args = ["-f", str(golden / "r1.fq"), "-f2", str(golden / "r2.fq")]
    run_both(golden, args, args + ["-backend", "python"], "pe_batchnw")


def test_pacbio_batched_device_nw(golden, monkeypatch):
    monkeypatch.setenv("KART_BATCH_NW", "1")
    args = ["-pacbio", "-f", str(golden / "pb1.fq")]
    run_both(golden, args, args + ["-backend", "python"], "pb_batchnw")


def test_paired_end_device_cluster(golden, monkeypatch):
    """Device candidate clustering (ops/cluster.py) in the full pipeline."""
    monkeypatch.setenv("KART_DEVICE_CLUSTER", "1")
    args = ["-f", str(golden / "r1.fq"), "-f2", str(golden / "r2.fq")]
    run_both(golden, args, args + ["-backend", "python"], "pe_devcluster")


def test_paired_end_full_device_stages(golden, monkeypatch):
    """All device stages at once: device seeding + clustering + pairing +
    batched Pallas NW conquer, through the python pipeline."""
    monkeypatch.setenv("KART_DEVICE_CLUSTER", "1")
    monkeypatch.setenv("KART_DEVICE_PAIR", "1")
    monkeypatch.setenv("KART_BATCH_NW", "1")
    args = ["-f", str(golden / "r1.fq"), "-f2", str(golden / "r2.fq")]
    run_both(golden, args, args + ["-backend", "python"], "pe_alldevice")


def test_malformed_inputs_match_reference(golden, workdir):
    """Degenerate inputs (short quality line incl. the reference's raw
    strncpy semantics, no trailing newline, N runs, tiny reads, header
    trimming, lowercase) produce byte-identical output to the reference."""
    d = workdir / "edge"
    d.mkdir(exist_ok=True)
    seq32 = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    cases = {
        "no_trail": f"@r0\n{seq32}\n+\n" + "I" * 32,
        "short_qual": f"@r0\n{seq32}\n+\nIII\n@r1\nTTTT{seq32[:24]}TTTT\n+\n"
        + "I" * 32 + "\n",
        "n_runs": "@r0\nACGTNNNNNNACGTACGTACGTACGTNNACGT\n+\n" + "I" * 32 + "\n",
        "tiny": "@r0\nACGT\n+\nIIII\n",
        "hdr": f"@read zzz/1\ttail\n{seq32}\n+\n" + "I" * 32 + "\n",
        "lower": f"@r0\n{seq32.lower()}\n+\n" + "I" * 32 + "\n",
    }
    for name, text in cases.items():
        f = d / f"{name}.fq"
        f.write_text(text)
        args = ["-f", str(f)]
        run_both(golden, args, args, f"edge_{name}")


def test_multiple_libraries(golden, workdir):
    """Two PE libraries in one invocation (-f a b -f2 c d): mapped
    sequentially with shared insert-size state, like the reference."""
    d = workdir / "multilib"
    d.mkdir(exist_ok=True)
    # split the golden reads into two libraries
    for src, p1, p2 in (("r1.fq", "a1.fq", "b1.fq"), ("r2.fq", "a2.fq", "b2.fq")):
        recs = (golden / src).read_text().splitlines(keepends=True)
        recs = ["".join(recs[i : i + 4]) for i in range(0, len(recs), 4)]
        half = len(recs) // 2
        (d / p1).write_text("".join(recs[:half]))
        (d / p2).write_text("".join(recs[half:]))
    args = ["-f", str(d / "a1.fq"), str(d / "b1.fq"),
            "-f2", str(d / "a2.fq"), str(d / "b2.fq")]
    run_both(golden, args, args, "multilib")
