"""i64 FM-index kernel path: for human-scale (>2^31 text bases) genomes the
device arrays switch to int64 (loader.index_dtype).  The kernels are
dtype-polymorphic; this forces the int64 path on a small genome and checks
bit-equality with the int32 path (reference: src/BWT_Index/bwt.h:41 —
bwtint_t is uint64 throughout, so the reference has a single code path and
the parity target is the same)."""

import jax
import numpy as np
import pytest

from kart_tpu.index import build_index, load_index
from kart_tpu.ops.fm_search import (
    FMIndexArrays,
    sa_walk,
    seed_scan,
    sensitive_scan,
)


@pytest.fixture(scope="module")
def small_idx(workdir):
    from conftest import make_genome

    rng = np.random.default_rng(77)
    fa = workdir / "i64.fa"
    fa.write_text(make_genome(rng, [50000], n_runs=2))
    prefix = str(workdir / "i64_idx")
    build_index(str(fa), prefix, verbose=False)
    return load_index(prefix)


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _fm64(gidx):
    """The int64 twin of the genome's device FM arrays."""
    import jax.numpy as jnp

    d = gidx.device_arrays
    return FMIndexArrays(
        occ_cp=jnp.asarray(np.asarray(d["occ_cp"]).astype(np.int64).reshape(-1)),
        bwt_words=jnp.asarray(np.asarray(d["bwt_words"]).reshape(-1)),
        sa_samples=jnp.asarray(np.asarray(d["sa_samples"]).astype(np.int64)),
        L2=jnp.asarray(np.asarray(d["L2"]).astype(np.int64)),
        primary=jnp.asarray(np.int64(d["primary"])),
        seq_len=jnp.asarray(np.int64(d["seq_len"])),
        sa_full=jnp.asarray(gidx.sa_full.astype(np.int64)),
    )


def _reads(gidx, rng, n, rlen):
    from kart_tpu.index.format import NT4_TABLE

    ref = gidx.ref_seq
    reads = np.zeros((n, rlen), np.int32)
    for i in range(n):
        p = int(rng.integers(0, gidx.genome_size - rlen))
        enc = NT4_TABLE[ref[p : p + rlen]].astype(np.int32)
        if i % 3 == 0:  # sprinkle mismatches so extensions break
            enc[rng.integers(0, rlen, 3)] = rng.integers(0, 4, 3)
        reads[i] = enc
    rlens = np.full(n, rlen, np.int32)
    return reads, rlens


def test_seed_scan_i64_matches_i32(small_idx, x64):
    gidx = small_idx
    fm32 = FMIndexArrays.from_genome_index(gidx)
    fm64 = _fm64(gidx)
    rng = np.random.default_rng(5)
    reads, rlens = _reads(gidx, rng, 32, 128)
    msl = np.int32(13)
    p32 = np.asarray(seed_scan(fm32, reads, rlens, msl, max_seeds=10, l_max=128))
    p64 = np.asarray(seed_scan(fm64, reads, rlens, msl, max_seeds=10, l_max=128))
    assert p64.dtype == np.int64
    assert np.array_equal(p32.astype(np.int64), p64)


def test_sensitive_scan_i64_matches_i32(small_idx, x64):
    gidx = small_idx
    fm32 = FMIndexArrays.from_genome_index(gidx)
    fm64 = _fm64(gidx)
    rng = np.random.default_rng(6)
    reads, rlens = _reads(gidx, rng, 8, 400)
    msl = np.int32(13)
    p32 = np.asarray(sensitive_scan(fm32, reads, rlens, msl, max_seeds=40, l_max=400))
    p64 = np.asarray(sensitive_scan(fm64, reads, rlens, msl, max_seeds=40, l_max=400))
    assert np.array_equal(p32.astype(np.int64), p64)


def test_sa_walk_i64_matches_full_sa(small_idx, x64):
    gidx = small_idx
    fm64 = _fm64(gidx)
    rng = np.random.default_rng(7)
    ks = rng.integers(1, gidx.seq_len, size=256).astype(np.int64)
    pos, done = sa_walk(fm64, ks)
    assert bool(np.all(done))
    assert np.array_equal(np.asarray(pos), gidx.sa_full[ks])


def test_index_dtype_gate(small_idx):
    assert small_idx.index_dtype is np.int32
    assert "sa_full" not in small_idx.device_arrays
