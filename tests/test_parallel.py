"""Sharded-index / data-parallel / merge tests (8 fake CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def tiny_gidx():
    import __graft_entry__ as g

    return g._tiny_index()


@pytest.fixture(scope="module")
def fm_repl(tiny_gidx):
    from kart_tpu.ops.fm_search import FMIndexArrays

    return FMIndexArrays.from_genome_index(tiny_gidx)


def _reads(gidx, b, rlen, seed=0):
    import __graft_entry__ as g

    return g._example_reads(gidx, b, rlen, seed)


def test_sharded_occ4_matches_replicated(tiny_gidx, fm_repl):
    from kart_tpu.ops.fm_search import occ4
    from kart_tpu.parallel import ShardedFM, build_sharded_fm, sharded_occ4_batch
    from kart_tpu.parallel.dp import ShardedFMSpecs

    n_idx = 4
    mesh = Mesh(np.array(jax.devices("cpu")[:n_idx]), ("idx",))
    sfm_host, geom = build_sharded_fm(tiny_gidx, n_idx)
    sfm = jax.tree.map(jnp.asarray, sfm_host)
    sfm.occ_cp = jax.device_put(sfm.occ_cp, NamedSharding(mesh, P("idx")))
    sfm.bwt_words = jax.device_put(sfm.bwt_words, NamedSharding(mesh, P("idx")))
    sfm.sa_full = jax.device_put(sfm.sa_full, NamedSharding(mesh, P("idx")))

    rng = np.random.default_rng(0)
    ks = jnp.asarray(rng.integers(1, tiny_gidx.seq_len, size=256).astype(np.int32))

    want = np.asarray(jax.vmap(lambda k: occ4(fm_repl, k))(ks))

    got = jax.jit(
        jax.shard_map(
            lambda s, k: sharded_occ4_batch(s, geom["nb_local"], "idx", k),
            mesh=mesh,
            in_specs=(ShardedFMSpecs("idx"), P()),
            out_specs=P(),
        )
    )(sfm, ks)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sharded_seed_scan_matches_replicated(tiny_gidx, fm_repl):
    from kart_tpu.ops.fm_search import seed_scan
    from kart_tpu.parallel import make_mapping_step, make_data_mesh

    rlen, min_seed = 48, 13
    max_seeds = rlen // (min_seed + 1) + 1
    B = 16
    reads, rlens = _reads(tiny_gidx, B, rlen, seed=3)
    # inject mismatches so seeds split
    reads[:, rlen // 2] = (reads[:, rlen // 2] + 1) % 4

    want = np.asarray(
        seed_scan(
            fm_repl,
            jnp.asarray(reads),
            jnp.asarray(rlens),
            jnp.int32(min_seed),
            max_seeds=max_seeds,
            l_max=rlen,
        )
    )

    mesh = make_data_mesh(2, 4)
    step, place = make_mapping_step(
        mesh, tiny_gidx, idx_axis="idx",
        min_seed_len=min_seed, max_seeds=max_seeds, l_max=rlen,
    )
    packed, locs, total = step(*place(reads, rlens))
    np.testing.assert_array_equal(np.asarray(packed), want)
    assert int(total) == int(want[:, 0].sum())
    # SA resolution matches the replicated full-SA gather
    k0 = want[:, 1 + 2 * max_seeds : 1 + 3 * max_seeds]
    np.testing.assert_array_equal(
        np.asarray(locs), np.asarray(fm_repl.sa_full)[k0]
    )


def test_sharded_sa_walk_matches_full_sa(tiny_gidx, fm_repl):
    """Frugal sharded resolver (VERDICT r4 #6): inverse-Psi walk over the
    mesh (one psum per step) with the intv-32 samples block-sharded and the
    full SA never built — positions must equal the full-SA gather."""
    from kart_tpu.parallel import build_sharded_fm
    from kart_tpu.parallel.dp import ShardedFMSpecs, place_sharded_fm
    from kart_tpu.parallel.sharded_index import sharded_sa_walk

    n_idx = 4
    mesh = Mesh(np.array(jax.devices("cpu")[:n_idx]), ("idx",))
    sfm_host, geom = build_sharded_fm(tiny_gidx, n_idx, sa_mode="sampled")
    assert sfm_host.sa_full is None  # never built
    sfm = place_sharded_fm(sfm_host, mesh, "idx")

    rng = np.random.default_rng(7)
    rows = jnp.asarray(rng.integers(1, tiny_gidx.seq_len, size=512).astype(np.int32))

    pos, done = jax.jit(
        jax.shard_map(
            lambda s, r: sharded_sa_walk(
                s, geom["nb_local"], geom["nsamp_local"], "idx", r
            ),
            mesh=mesh,
            in_specs=(ShardedFMSpecs("idx", with_full_sa=False), P()),
            out_specs=(P(), P()),
        )
    )(sfm, rows)
    assert bool(np.all(np.asarray(done)))
    np.testing.assert_array_equal(
        np.asarray(pos), np.asarray(fm_repl.sa_full)[np.asarray(rows)]
    )


def test_data_parallel_step_replicated_index(tiny_gidx, fm_repl):
    from kart_tpu.ops.fm_search import seed_scan
    from kart_tpu.parallel import make_mapping_step, make_data_mesh

    rlen, min_seed = 48, 13
    max_seeds = rlen // (min_seed + 1) + 1
    B = 32
    reads, rlens = _reads(tiny_gidx, B, rlen, seed=5)
    want = np.asarray(
        seed_scan(
            fm_repl,
            jnp.asarray(reads),
            jnp.asarray(rlens),
            jnp.int32(min_seed),
            max_seeds=max_seeds,
            l_max=rlen,
        )
    )
    mesh = make_data_mesh(8)
    step, place = make_mapping_step(
        mesh, tiny_gidx, min_seed_len=min_seed, max_seeds=max_seeds, l_max=rlen
    )
    packed, locs, total = step(*place(reads, rlens))
    np.testing.assert_array_equal(np.asarray(packed), want)
    assert int(total) == int(want[:, 0].sum())


def test_ordered_chunk_writer():
    import random

    from kart_tpu.parallel import OrderedChunkWriter

    out = []
    w = OrderedChunkWriter(out.append)
    order = list(range(50))
    random.Random(7).shuffle(order)
    for i in order:
        w.push(i, f"chunk{i};")
    w.close()
    assert "".join(out) == "".join(f"chunk{i};" for i in range(50))


def test_ordered_chunk_writer_missing():
    from kart_tpu.parallel import OrderedChunkWriter

    w = OrderedChunkWriter(lambda s: None)
    w.push(1, "x")
    with pytest.raises(RuntimeError):
        w.close()


def test_fastq_byte_ranges_partition(tmp_path):
    from kart_tpu.parallel import fastq_record_offsets

    # quality lines deliberately start with '@' to stress record detection
    p = tmp_path / "reads.fq"
    recs = []
    rng = np.random.default_rng(11)
    for i in range(97):
        L = int(rng.integers(30, 90))
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        qual = "@" * L
        recs.append(f"@read{i} x\n{seq}\n+\n{qual}\n")
    p.write_text("".join(recs))

    for n_shards in (1, 2, 3, 8):
        ranges = fastq_record_offsets(str(p), n_shards, fastq=True)
        text = p.read_bytes()
        assert ranges[0][0] == 0 and ranges[-1][1] == len(text)
        got = []
        for lo, hi in ranges:
            part = text[lo:hi].decode()
            assert part == "" or part.startswith("@read")
            got.append(part)
        assert "".join(got) == text.decode()
        # each shard contains whole records
        for part in got:
            assert part.count("\n") % 4 == 0


def test_merge_sam_shards(tmp_path):
    from kart_tpu.parallel import merge_sam_shards

    a = tmp_path / "a.sam"
    b = tmp_path / "b.sam"
    a.write_text("@HD\tVN:1.0\n@SQ\tSN:c\tLN:9\nr1\t0\nr2\t0\n")
    b.write_text("@HD\tVN:1.0\n@SQ\tSN:c\tLN:9\nr3\t0\n")
    out = tmp_path / "m.sam"
    merge_sam_shards([str(a), str(b)], str(out))
    assert out.read_text() == "@HD\tVN:1.0\n@SQ\tSN:c\tLN:9\nr1\t0\nr2\t0\nr3\t0\n"


def test_cli_idx_shards_matches_default(workdir, small_genome):
    """Product-path sharded-index mode: `-idx-shards 8` (FM-index block-
    sharded over the 8-device mesh, one fused psum per scan step) must
    produce byte-identical SAM to the default replicated run."""
    import sys
    from pathlib import Path

    from kart_tpu import cli as kart_cli
    from kart_tpu.index import build_index, index_files_exist

    REPO = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(REPO / "tools"))
    from simulate_reads import simulate

    prefix = workdir / "small_idx"
    if not index_files_exist(str(prefix)):
        build_index(str(small_genome), str(prefix), verbose=False)
    r1 = workdir / "shard_r1.fq"
    r2 = workdir / "shard_r2.fq"
    simulate(str(small_genome), str(r1), str(r2), n_reads=2000, read_len=100, seed=9)

    base = workdir / "shard_base.sam"
    sharded = workdir / "shard_idx8.sam"
    assert kart_cli.main(
        ["kart-tpu", "-i", str(prefix), "-f", str(r1), "-f2", str(r2),
         "-o", str(base), "-silent"]) == 0
    assert kart_cli.main(
        ["kart-tpu", "-i", str(prefix), "-f", str(r1), "-f2", str(r2),
         "-o", str(sharded), "-silent", "-idx-shards", "8"]) == 0
    assert sharded.read_bytes() == base.read_bytes()


def test_cli_idx_shards_sampled_frugal(workdir, small_genome, monkeypatch):
    """-idx-shards + KART_SA_MODE=sampled: the truly frugal sharded mode
    (VERDICT r4 #6) — sa_samples sharded, the full SA NEVER built, rows
    resolved by the sharded inverse-Psi walk.  SAM must equal the default
    replicated run; a tripwire asserts gidx.sa_full is never accessed."""
    from pathlib import Path

    from kart_tpu import cli as kart_cli
    from kart_tpu.index import index_files_exist
    from kart_tpu.index.loader import GenomeIndex

    prefix = workdir / "small_idx"
    assert index_files_exist(str(prefix))  # built by the test above
    r1 = workdir / "shard_r1.fq"
    r2 = workdir / "shard_r2.fq"
    base = workdir / "shard_base.sam"
    assert base.exists()

    def boom(self):
        raise AssertionError("sa_full was built in frugal sharded mode")

    monkeypatch.setattr(GenomeIndex, "sa_full", property(boom))
    monkeypatch.setenv("KART_SA_MODE", "sampled")
    out = workdir / "shard_idx8_sampled.sam"
    assert kart_cli.main(
        ["kart-tpu", "-i", str(prefix), "-f", str(r1), "-f2", str(r2),
         "-o", str(out), "-silent", "-idx-shards", "8"]) == 0
    assert out.read_bytes() == base.read_bytes()
