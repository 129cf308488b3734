"""Batched candidate clustering on device (the divide-stage entry).

Device recast of GenerateAlignmentCandidateForIlluminaSeq (reference:
src/AlignmentCandidates.cpp:82-130): PosDiff-sorted seeds are grouped into
clusters by a fixed-trip scan over seed slots (vectorized across the read
batch), cluster scores are a segment scatter-add, and the reference's
rising acceptance threshold (thr -> score-50 on accept) is a second scan
over cluster slots.  Cluster boundaries depend only on the seeds —
PosDiff chain gaps > MaxGaps and the chromosome-boundary lookup
(GetAlignmentBoundary, src/tools.cpp:399), here a vectorized searchsorted
over the ChrLocMap keys — so the device output maps 1:1 onto the host
Candidate construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnames=("max_seeds",))
def cluster_illumina(
    chr_keys,  # (K,) i32 sorted chromosome end keys (2x genome)
    pd,  # (B, S) i32 posdiff, sorted (posdiff, rpos); pad with _BIG
    gp,  # (B, S) i32 gpos
    ln,  # (B, S) i32 seed length
    n_seeds,  # (B,) i32
    thr0,  # (B,) i32 initial threshold min(int(rlen*0.2), 50)
    max_gaps,  # () i32
    *,
    max_seeds: int,
):
    """-> (cluster_id (B,S) i32 [-1 = none], accept (B,S) bool per cluster
    slot, scores (B,S) i32 per cluster slot)."""
    B, S = pd.shape
    tidx = jnp.arange(S)[None, :]
    valid = (tidx < n_seeds[:, None]) & (pd >= 0)

    def step(t, carry):
        gend, prev_pd, started, cid, cluster_id = carry
        v = valid[:, t]
        brk = (~started) | (gp[:, t] > gend) | (pd[:, t] - prev_pd > max_gaps)
        is_new = v & brk
        lb = jnp.searchsorted(chr_keys, gp[:, t], side="left")
        gend_new = jnp.where(
            lb < chr_keys.shape[0], chr_keys[jnp.minimum(lb, chr_keys.shape[0] - 1)], _BIG
        )
        gend = jnp.where(is_new, gend_new, gend)
        started = started | v
        cid = cid + is_new.astype(jnp.int32)
        cluster_id = cluster_id.at[:, t].set(jnp.where(v, cid, -1))
        prev_pd = jnp.where(v, pd[:, t], prev_pd)
        return gend, prev_pd, started, cid, cluster_id

    # carries derive from the inputs so they inherit the device-varying
    # type under shard_map (a literal zeros() carry is "unvarying" and
    # rejected by the manual-axes check; cf. ops/fm_search.py)
    z = n_seeds * 0
    zb = jnp.full((B, S), -1, jnp.int32) + 0 * pd
    carry = (z, z, z < -1, z - 1, zb)
    _, _, _, _, cluster_id = jax.lax.fori_loop(0, S, step, carry)

    # per-cluster scores (scatter-add; -1 ids dropped)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, S))
    cid_safe = jnp.where(cluster_id >= 0, cluster_id, S)
    scores = jnp.zeros((B, S), jnp.int32).at[bidx, cid_safe].add(
        jnp.where(valid, ln, 0), mode="drop"
    )

    # rising-threshold acceptance scan over cluster slots
    def stepc(c, carry):
        thr, accept = carry
        s = scores[:, c]
        a = s > thr
        thr = jnp.where(a & (s - 50 > thr), s - 50, thr)
        accept = accept.at[:, c].set(a)
        return thr, accept

    thr, accept = jax.lax.fori_loop(
        0, S, stepc, (thr0, (pd < pd))
    )
    return cluster_id, accept, scores


def cluster_batch_to_candidates(gidx, seeds_lists, rlens, max_gaps: int):
    """Run device clustering for a batch of PosDiff-sorted seed lists and
    materialize host Candidate objects (seeds re-sorted by gPos within each
    accepted cluster, exactly like the host path)."""
    from ..pipeline.candidates import Candidate, Seed, sort_by_gpos

    B = len(seeds_lists)
    S = max(1, max(len(s) for s in seeds_lists))
    pd = np.full((B, S), _BIG, np.int32)
    gp = np.zeros((B, S), np.int32)
    ln = np.zeros((B, S), np.int32)
    n = np.zeros(B, np.int32)
    thr0 = np.minimum((np.asarray(rlens) * 0.2).astype(np.int32), 50)
    for b, seeds in enumerate(seeds_lists):
        n[b] = len(seeds)
        for t, s in enumerate(seeds):
            pd[b, t] = s.posdiff
            gp[b, t] = s.gpos
            ln[b, t] = s.rlen
    keys, _ = gidx.chr_map
    cid, accept, scores = (
        np.asarray(x)
        for x in cluster_illumina(
            jnp.asarray(keys.astype(np.int32)),
            pd, gp, ln, n, thr0, np.int32(max_gaps), max_seeds=S,
        )
    )
    out_all = []
    for b, seeds in enumerate(seeds_lists):
        cands = []
        ids = cid[b]
        for c in range(ids.max() + 1 if len(seeds) else 0):
            if not accept[b, c]:
                continue
            members = [seeds[t] for t in range(len(seeds)) if ids[t] == c]
            cand = Candidate(score=int(scores[b, c]), posdiff=0)
            cand.seeds = [
                Seed(s.simple, s.rpos, s.gpos, s.rlen, s.glen, s.posdiff)
                for s in members
            ]
            cand.posdiff = max(cand.seeds[0].posdiff, 0)
            sort_by_gpos(cand.seeds)
            cands.append(cand)
        out_all.append(cands)
    return out_all
