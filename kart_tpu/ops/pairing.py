"""Batched paired-end candidate mating on device.

Device recast of CheckPairedAlignmentCandidates (reference:
src/Mapping.cpp:348-400), vectorized across all read pairs of a chunk: for
each read-1 candidate i (scan in order, preserving the reference's
steal-if-better semantics), the best mate among read-2 candidates is a
masked max over the candidate axis — unique-max wins, ties yield no mate
(the reference's `== s -> best_mate = -1` rule collapses to
"multiplicity of the max > 1").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def pair_candidates(score1, pd1, score2, pd2, est):
    """score1/pd1: (P, C1) i32, score2/pd2: (P, C2) i32 (0-score = absent
    slot), est: () i32 -> (paired1 (P,C1), paired2 (P,C2), pairing (P,)
    bool), paired_* are mate indices or -1."""
    P, C1 = score1.shape
    C2 = score2.shape[1]
    ar = jnp.arange(P)

    def step(i, carry):
        paired1, paired2, pairing = carry
        pd_i = pd1[:, i][:, None]
        m = (score2 > 0) & (pd2 >= pd_i) & ((pd2 - pd_i) < est)
        sc = jnp.where(m, score2, 0)
        s = sc.max(axis=1)
        is_max = (sc == s[:, None]) & (s[:, None] > 0)
        nmax = is_max.sum(axis=1)
        j = jnp.argmax(sc, axis=1).astype(jnp.int32)
        ok = (score1[:, i] > 0) & (s > 0) & (nmax == 1)

        pj = paired2[ar, j]  # current owner of mate j (or -1)
        free = pj < 0
        owner_score = score1[ar, jnp.maximum(pj, 0)]
        steal = (~free) & (score1[:, i] > owner_score)
        do = ok & (free | steal)

        # unlink the stolen owner
        clear_idx = jnp.where(do & steal, jnp.maximum(pj, 0), C1)
        paired1 = paired1.at[ar, clear_idx].set(-1, mode="drop")
        paired1 = paired1.at[:, i].set(jnp.where(do, j, paired1[:, i]))
        paired2 = paired2.at[ar, jnp.where(do, j, C2)].set(i, mode="drop")
        return paired1, paired2, pairing | do

    # carries derive from the inputs: see ops/cluster.py (shard_map
    # varying-manual-axes check)
    paired1 = jnp.full((P, C1), -1, jnp.int32) + 0 * score1
    paired2 = jnp.full((P, C2), -1, jnp.int32) + 0 * score2
    pairing = score1[:, 0] < 0
    paired1, paired2, pairing = jax.lax.fori_loop(
        0, C1, step, (paired1, paired2, pairing)
    )
    return paired1, paired2, pairing


def pair_chunk_on_device(est_distance: int, pairs):
    """pairs: list of (cands1, cands2) Candidate lists (already through the
    reference's >1000 pre-prune).  Runs the mating scan for the whole chunk
    on device and writes paired_idx back into the Candidate objects.
    Returns the per-pair `pairing` flags."""
    P = len(pairs)
    if P == 0:
        return []
    C1 = max(1, max(len(a) for a, _ in pairs))
    C2 = max(1, max(len(b) for _, b in pairs))
    s1 = np.zeros((P, C1), np.int32)
    d1 = np.zeros((P, C1), np.int32)
    s2 = np.zeros((P, C2), np.int32)
    d2 = np.zeros((P, C2), np.int32)
    for p, (a, b) in enumerate(pairs):
        for i, c in enumerate(a):
            s1[p, i] = c.score
            d1[p, i] = c.posdiff
        for j, c in enumerate(b):
            s2[p, j] = c.score
            d2[p, j] = c.posdiff
    p1, p2, flag = (
        np.asarray(x) for x in pair_candidates(s1, d1, s2, d2, np.int32(est_distance))
    )
    out = []
    for p, (a, b) in enumerate(pairs):
        for i, c in enumerate(a):
            c.paired_idx = int(p1[p, i])
        for j, c in enumerate(b):
            c.paired_idx = int(p2[p, j])
        out.append(bool(flag[p]))
    return out
