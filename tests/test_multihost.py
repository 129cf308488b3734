"""Multi-host data parallelism semantics.

Three levels, increasingly strong:
  * below the 1000-pair threshold the insert estimate is constant
    (reference Mapping.cpp:533-540) and independent shard mapping + ordered
    merge equals the single-host run (test_two_host_merge_equals_single_host);
  * ABOVE the threshold the estimate is a sequential recurrence over the
    chunk stream; the speculative stat relay (parallel/stats_sync.py) keeps
    hosts parallel while reproducing the single-host stream bit-exactly
    (test_stat_relay_above_threshold);
  * a GENUINE two-process jax.distributed run — separate interpreters,
    coordinator handshake, cross-process allgather over gloo, TCP stat
    relay — must also reproduce the single-host output bit-exactly
    (test_two_process_jax_distributed)."""

import json
import socket
import subprocess
import sys
import threading
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


@pytest.fixture(scope="module")
def evolving_fixture(workdir, small_genome):
    """8 chunks (16000 pairs) whose insert-size distribution shifts midway
    (300 -> 600), so EstDistance changes across chunk boundaries and the
    speculative relay actually has to detect and correct mismatches."""
    from kart_tpu.index import build_index, index_files_exist

    sys.path.insert(0, str(REPO / "tools"))
    from simulate_reads import simulate

    prefix = workdir / "small_idx"
    if not index_files_exist(str(prefix)):
        build_index(str(small_genome), str(prefix), verbose=False)
    r1, r2 = workdir / "ev_r1.fq", workdir / "ev_r2.fq"
    a1, a2 = workdir / "ev_a1.fq", workdir / "ev_a2.fq"
    b1, b2 = workdir / "ev_b1.fq", workdir / "ev_b2.fq"
    simulate(str(small_genome), str(a1), str(a2), n_reads=16000, read_len=100,
             dist=300, std=30, seed=21)
    simulate(str(small_genome), str(b1), str(b2), n_reads=16000, read_len=100,
             dist=600, std=60, seed=22)
    r1.write_bytes(a1.read_bytes() + b1.read_bytes())
    r2.write_bytes(a2.read_bytes() + b2.read_bytes())
    return prefix, r1, r2


def _records_only(path: Path) -> str:
    return "".join(
        ln for ln in path.read_text().splitlines(keepends=True) if not ln.startswith("@")
    )


def test_stat_relay_above_threshold(evolving_fixture, workdir):
    """2 concurrent shard mappers + LocalStatRelay == single-host stream,
    bit-exact, ABOVE the 1000-pair threshold with an evolving estimate."""
    from kart_tpu.index import load_index
    from kart_tpu.parallel.stats_sync import (
        LocalStatRelay,
        chunk_aligned_ranges,
        map_shard,
    )
    from kart_tpu.pipeline.mapper import KartMapper

    prefix, r1, r2 = evolving_fixture
    single = workdir / "ev_single.sam"
    _map_to(prefix, r1, r2, single)

    n_pairs = sum(1 for _ in open(r1)) // 4
    assert n_pairs == 16000
    ranges = chunk_aligned_ranges(n_pairs, 2)
    shards1 = _split_by_ranges(r1, [(lo, hi) for lo, hi, _ in ranges], workdir, "ev1")
    shards2 = _split_by_ranges(r2, [(lo, hi) for lo, hi, _ in ranges], workdir, "ev2")

    gidx = load_index(str(prefix))
    relay = LocalStatRelay()
    outs = [[] for _ in range(2)]
    counters = [dict() for _ in range(2)]

    def run(s):
        mapper = KartMapper(gidx)
        map_shard(mapper, str(shards1[s]), str(shards2[s]), True, True, relay,
                  ranges[s][2], outs[s].append, counters[s])

    threads = [threading.Thread(target=run, args=(s,)) for s in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    merged = "".join("".join(o) for o in outs)
    assert merged == _records_only(single)
    # the workload is engineered so speculation is actually exercised
    assert sum(c.get("chunks", 0) for c in counters) == 8


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_jax_distributed(evolving_fixture, workdir):
    """Genuine 2-process jax.distributed: coordinator handshake, gloo
    allgather across interpreters, TCP stat relay, bit-exact merged SAM."""
    import os

    from kart_tpu.parallel.stats_sync import StatRelayServer, chunk_aligned_ranges

    prefix, r1, r2 = evolving_fixture
    single = workdir / "ev_single2.sam"
    _map_to(prefix, r1, r2, single)

    n_pairs = 16000
    ranges = chunk_aligned_ranges(n_pairs, 2)
    shards1 = _split_by_ranges(r1, [(lo, hi) for lo, hi, _ in ranges], workdir, "jd1")
    shards2 = _split_by_ranges(r2, [(lo, hi) for lo, hi, _ in ranges], workdir, "jd2")

    server = StatRelayServer()
    coord_port = _free_port()
    procs = []
    outs = []
    try:
        for pid in range(2):
            out = workdir / f"jd_shard{pid}.sam"
            outs.append(out)
            cfg = workdir / f"jd_cfg{pid}.json"
            cfg.write_text(json.dumps(dict(
                coordinator=f"127.0.0.1:{coord_port}",
                nprocs=2, pid=pid, repo=str(REPO),
                prefix=str(prefix),
                r1=str(shards1[pid]), r2=str(shards2[pid]),
                relay_host=server.address[0], relay_port=server.address[1],
                first_chunk=ranges[pid][2], out=str(out),
            )))
            env = dict(os.environ)
            env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
            env.pop("XLA_FLAGS", None)  # 1 local device per process
            procs.append(subprocess.Popen(
                [sys.executable, str(Path(__file__).parent / "mh_worker.py"), str(cfg)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            ))
        for p in procs:
            sout, serr = p.communicate(timeout=600)
            assert p.returncode == 0, serr.decode()[-2000:]
            assert b"WORKER_OK" in sout, sout.decode()[-500:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        server.close()
    merged = "".join(o.read_text() for o in outs)
    assert merged == _records_only(single)


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
