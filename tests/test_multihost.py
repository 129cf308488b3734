"""Multi-host data parallelism semantics: shard the input deterministically,
map each shard with an independent mapper ("host"), merge shard outputs —
the result must equal the single-host run (the ordered-merge guarantee of
parallel/merge.py).  Below 1000 paired observations the online insert-size
estimate is the constant MaxInsertSize (reference Mapping.cpp:533-540), so
sharding cannot perturb pairing decisions on this workload."""

import sys
from pathlib import Path

import numpy as np
import pytest

from conftest import make_genome

REPO = Path(__file__).resolve().parent.parent


def _map_to(prefix, r1, r2, out):
    from kart_tpu import cli as kart_cli

    args = ["kart-tpu", "-i", str(prefix), "-f", str(r1)]
    if r2 is not None:
        args += ["-f2", str(r2)]
    args += ["-o", str(out), "-silent"]
    assert kart_cli.main(args) == 0


@pytest.fixture(scope="module")
def mh_fixture(workdir, small_genome):
    from kart_tpu.index import build_index, index_files_exist

    sys.path.insert(0, str(REPO / "tools"))
    from simulate_reads import simulate

    prefix = workdir / "small_idx"
    if not index_files_exist(str(prefix)):
        build_index(str(small_genome), str(prefix), verbose=False)
    r1 = workdir / "mh_r1.fq"
    r2 = workdir / "mh_r2.fq"
    simulate(str(small_genome), str(r1), str(r2), n_reads=1200, read_len=100, seed=5)
    return prefix, r1, r2


def _split_by_ranges(path, ranges, outdir, tag):
    recs = Path(path).read_text().splitlines(keepends=True)
    recs = ["".join(recs[i : i + 4]) for i in range(0, len(recs), 4)]
    outs = []
    for s, (lo, hi) in enumerate(ranges):
        p = Path(outdir) / f"{tag}_shard{s}.fq"
        p.write_text("".join(recs[lo:hi]))
        outs.append(p)
    return outs


def test_two_host_merge_equals_single_host(mh_fixture, workdir):
    from kart_tpu.parallel import merge_sam_shards, paired_record_ranges

    prefix, r1, r2 = mh_fixture
    single = workdir / "mh_single.sam"
    _map_to(prefix, r1, r2, single)

    ranges = paired_record_ranges(str(r1), str(r2), 2)
    shards1 = _split_by_ranges(r1, ranges, workdir, "mh1")
    shards2 = _split_by_ranges(r2, ranges, workdir, "mh2")
    shard_sams = []
    for s in range(2):
        out = workdir / f"mh_shard{s}.sam"
        _map_to(prefix, shards1[s], shards2[s], out)
        shard_sams.append(out)

    merged = workdir / "mh_merged.sam"
    merge_sam_shards([str(p) for p in shard_sams], str(merged))
    assert merged.read_text() == single.read_text()


def test_library_sharding_partition():
    from kart_tpu.parallel import shard_libraries

    f1 = [f"lib{i}_1.fq" for i in range(5)]
    f2 = [f"lib{i}_2.fq" for i in range(5)]
    seen = []
    for p in range(3):
        a, b = shard_libraries(f1, f2, p, 3)
        assert len(a) == len(b)
        seen += a
    assert sorted(seen) == sorted(f1)
