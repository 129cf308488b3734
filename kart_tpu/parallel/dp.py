"""Multi-chip mapping step: data-parallel reads × (optionally) sharded index.

This is the TPU equivalent of the reference's only parallelism — N pthreads
over read chunks with a shared read-only index (reference: src/Mapping.cpp:
488-742) — recast as SPMD over a jax.sharding.Mesh:

  * reads are the batch dimension, sharded along the `data` axis;
  * the FM-index is either replicated (small genomes — the per-thread
    shared-index model) or block-sharded along an `idx` axis (human-scale
    genomes), in which case every Occ/SA lookup is a masked local lookup +
    psum over `idx` riding the ICI (see parallel.sharded_index);
  * the reference's mutex-guarded global counters (iTotalReadNum etc.,
    src/Mapping.cpp:20) become a psum over `data`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fm_search import FMIndexArrays, seed_scan
from .sharded_index import build_sharded_fm, sharded_sa_gather, sharded_seed_scan


def make_mapping_step(
    mesh: Mesh,
    gidx,
    *,
    data_axis: str = "data",
    idx_axis: str | None = None,
    min_seed_len: int,
    max_seeds: int,
    l_max: int,
):
    """Build the jitted device mapping step over `mesh`.

    Returns (step, place_reads) where
      step(reads, rlens) -> (packed_seeds, locs, total_seeds)
        packed_seeds (B, 1+4*max_seeds) int32  seed blocks per read
        locs         (B, max_seeds)     int32  text position of each seed's
                                               first occurrence (SA-resolved)
        total_seeds  ()                 int32  global count (psum over data)
      place_reads(reads, rlens) puts host batches on the mesh with the
        right shardings (data-sharded, replicated along idx).
    """
    msl = jnp.int32(min_seed_len)

    if idx_axis is None:
        fm = FMIndexArrays.from_genome_index(gidx, sharding=NamedSharding(mesh, P()))

        def local_step(fm_l, reads, rlens):
            packed = seed_scan(
                fm_l, reads, rlens, msl, max_seeds=max_seeds, l_max=l_max
            )
            k0 = packed[:, 1 + 2 * max_seeds : 1 + 3 * max_seeds]
            locs = fm_l.sa_full[k0]
            total = jax.lax.psum(jnp.sum(packed[:, 0]), data_axis)
            return packed, locs, total

        step = jax.jit(
            jax.shard_map(
                local_step,
                mesh=mesh,
                in_specs=(P(), P(data_axis), P(data_axis)),
                out_specs=(P(data_axis), P(data_axis), P()),
            )
        )
        index_arg = fm
    else:
        n_shards = mesh.shape[idx_axis]
        sfm_host, geom = build_sharded_fm(gidx, n_shards)
        nb_local = geom["nb_local"]
        ns_local = geom["ns_local"]
        shard1 = NamedSharding(mesh, P(idx_axis))
        repl = NamedSharding(mesh, P())
        sfm = jax.tree.map(jnp.asarray, sfm_host)
        sfm.occ_cp = jax.device_put(sfm.occ_cp, shard1)
        sfm.bwt_words = jax.device_put(sfm.bwt_words, shard1)
        sfm.sa_full = jax.device_put(sfm.sa_full, shard1)
        sfm.L2 = jax.device_put(sfm.L2, repl)
        sfm.primary = jax.device_put(sfm.primary, repl)
        sfm.seq_len = jax.device_put(sfm.seq_len, repl)

        def local_step(sfm_l, reads, rlens):
            packed = sharded_seed_scan(
                sfm_l, nb_local, idx_axis, reads, rlens, msl,
                max_seeds=max_seeds, l_max=l_max,
            )
            k0 = packed[:, 1 + 2 * max_seeds : 1 + 3 * max_seeds]
            locs = sharded_sa_gather(sfm_l.sa_full, ns_local, idx_axis, k0)
            total = jax.lax.psum(jnp.sum(packed[:, 0]), data_axis)
            return packed, locs, total

        step = jax.jit(
            jax.shard_map(
                local_step,
                mesh=mesh,
                in_specs=(
                    ShardedFMSpecs(idx_axis),
                    P(data_axis),
                    P(data_axis),
                ),
                out_specs=(P(data_axis), P(data_axis), P()),
            )
        )
        index_arg = sfm

    batch_sharding = NamedSharding(mesh, P(data_axis))

    def place_reads(reads, rlens):
        return (
            jax.device_put(jnp.asarray(reads), batch_sharding),
            jax.device_put(jnp.asarray(rlens), batch_sharding),
        )

    return functools.partial(step, index_arg), place_reads


def ShardedFMSpecs(idx_axis: str):
    """PartitionSpecs pytree matching ShardedFM's flattened children."""
    from .sharded_index import ShardedFM

    return ShardedFM(
        occ_cp=P(idx_axis),
        bwt_words=P(idx_axis),
        sa_full=P(idx_axis),
        L2=P(),
        primary=P(),
        seq_len=P(),
    )


def make_data_mesh(n_data: int, n_idx: int = 1, devices=None) -> Mesh:
    """A (data[, idx]) mesh over the first n_data*n_idx local devices."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_idx
    devs = np.array(devices[:need])
    if n_idx == 1:
        return Mesh(devs, ("data",))
    return Mesh(devs.reshape(n_data, n_idx), ("data", "idx"))
