"""Large-genome path (beyond the direct-table gate): device FM seeding +
native post, golden vs the reference.  ~5 min — gated behind
KART_SLOW_TESTS=1 (validated manually each round as well)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REFBUILD, needs_reference

pytestmark = [
    needs_reference,
    pytest.mark.skipif(
        os.environ.get("KART_SLOW_TESTS") != "1",
        reason="slow (35Mbp index build x2); set KART_SLOW_TESTS=1",
    ),
]


def test_large_genome_golden(workdir):
    from kart_tpu import cli as kart_cli
    from kart_tpu.index import build_index, index_files_exist

    d = workdir / "big"
    d.mkdir(exist_ok=True)
    fa = d / "big.fa"
    if not fa.exists():
        rng = np.random.default_rng(31)
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=35_000_000)
        with open(fa, "wb") as f:
            f.write(b">bigchrom\n")
            s = seq.tobytes()
            for j in range(0, len(s), 70):
                f.write(s[j : j + 70] + b"\n")
    if not index_files_exist(str(d / "idx")):
        build_index(str(fa), str(d / "idx"), verbose=False)
    sys.path.insert(0, str(workdir.parent.parent / "tools"))
    from simulate_reads import simulate

    simulate(str(fa), str(d / "b1.fq"), str(d / "b2.fq"), n_reads=2000,
             read_len=150, seed=4)
    assert kart_cli.main(
        ["kart-tpu", "-i", str(d / "idx"), "-f", str(d / "b1.fq"),
         "-f2", str(d / "b2.fq"), "-o", str(d / "ours.sam"), "-silent"]
    ) == 0
    # the no-tables fallback (device FM seeding) must agree with the
    # direct-table path
    os.environ["KART_KMER_GATE"] = "1"
    try:
        assert kart_cli.main(
            ["kart-tpu", "-i", str(d / "idx"), "-f", str(d / "b1.fq"),
             "-f2", str(d / "b2.fq"), "-o", str(d / "ours_fm.sam"), "-silent"]
        ) == 0
    finally:
        del os.environ["KART_KMER_GATE"]
    assert (d / "ours_fm.sam").read_bytes() == (d / "ours.sam").read_bytes()
    if not (d / "refidx.bwt").exists():
        subprocess.run([str(REFBUILD / "bin" / "bwt_index"), str(fa), str(d / "refidx")],
                       check=True, capture_output=True)
    subprocess.run(
        [str(REFBUILD / "bin" / "kart"), "-t", "1", "-i", str(d / "refidx"),
         "-f", str(d / "b1.fq"), "-f2", str(d / "b2.fq"), "-o", str(d / "ref.sam")],
        check=True, capture_output=True,
    )
    assert (d / "ours.sam").read_bytes() == (d / "ref.sam").read_bytes()
