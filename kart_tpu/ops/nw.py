"""Batched Needleman-Wunsch Pallas TPU kernel (the conquer-step hot op).

The reference closes every "normal pair" (avg ~20 bp gapped fragment) with
a full O(mn) 3-matrix float DP (reference: src/nw_alignment.cpp:18-80).
This kernel runs that DP for a whole batch of fragment pairs at once:

  * lane-major layout: the DP planes are (Lp, Lp, N) with the batch in the
    128-wide lane dimension, so every antidiagonal update is an (Lp, Lp)
    masked elementwise op vectorized across 128 fragment pairs on the VPU;
  * float32 adds/maxes in the exact reference order, so scores (and the
    equality ties the backtrace keys on) are bit-identical to the host
    numpy implementation (pipeline/conquer.py) and the reference's C float
    arithmetic;
  * the kernel emits backtrace decision bitplanes (bit0: s==r, bit1: s==t
    at each cell) — the sequential, data-dependent backtrace walk stays on
    the host (nw_backtrace), exactly mirroring the reference's tie-break
    order (r first, then t — nw_alignment.cpp:61-68).

Fragments longer than the tile (reference keeps them <= ~30 bp by 8-mer
repartition; PacBio recursion keeps them <= 300) pick the next tile size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_PENALTY = np.float32(-65536)
OPEN_GAP = np.float32(-1)
EXTEND_GAP = np.float32(-0.5)
NEW_GAP = np.float32(-1.5)

LANES = 128  # fragment pairs per grid step (VPU lane width)

# Device tiles are 16/32 only: the divide step keeps normal pairs ~20bp
# (reference README; repartition re-splits anything larger), so these are
# the hot sizes.  The kernel keeps ~30 live (lm+1, lm+1, 128) planes
# (Mosaic pads the lane dim to 128 regardless of the logical batch), which
# exceeds the 16MB VMEM budget at lm >= 64 — rare large fragments take the
# host DP instead.
_TILE_LANES = {16: 128, 32: 128}


def _nw_kernel(c1_ref, c2_ref, eq_ref, *, lm: int):
    """One grid step: LANES fragment pairs, tile (lm x lm).

    c1_ref, c2_ref: (lm, LANES) int8 codes (4 = padding; padding never
    equals anything since both sides padded 4 vs 5).
    eq_ref: (lm+1, lm+1, LANES) uint8 out, bit0 = (s==r), bit1 = (s==t).
    """
    lp = lm + 1
    c1 = c1_ref[:]  # (lm, N)
    c2 = c2_ref[:]
    n = c1.shape[1]

    # substitution plane for cells (i>=1, j>=1): s1[i-1] vs s2[j-1].
    # Plain code equality: the reference compares nst_nt4 codes (N == N
    # matches); callers remap real ambiguous bases to a shared code and
    # pad the two sides with DIFFERENT codes so padding never matches.
    # All masks are materialized at full (lp, lp, n) shape, and the match
    # plane is computed arithmetically (|c1-c2| clamped to {0,1}): an i1
    # comparison of two differently-replicated broadcast layouts trips a
    # Mosaic relayout bug ("non-singleton logical dimension is replicated").
    c1i = c1.astype(jnp.int32)
    c2i = c2.astype(jnp.int32)
    diff = c1i[:, None, :] - c2i[None, :, :]  # (lm, lm, N) i32
    nz = jnp.minimum(jnp.abs(diff), 1).astype(jnp.float32)  # 0 = match
    sub = jnp.float32(1.5) - jnp.float32(3.0) * nz
    sub = jnp.pad(sub, ((1, 0), (1, 0), (0, 0)))  # align to (i, j) planes

    ii = jax.lax.broadcasted_iota(jnp.int32, (lp, lp, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (lp, lp, n), 1)

    # boundary init (nw_alignment.cpp:36-46)
    col0 = jj == 0
    row0 = ii == 0
    gap_i = OPEN_GAP + ii.astype(jnp.float32) * EXTEND_GAP
    gap_j = OPEN_GAP + jj.astype(jnp.float32) * EXTEND_GAP
    origin = row0 & col0
    r = jnp.where(row0, gap_j, MAX_PENALTY)
    t = jnp.where(col0, gap_i, MAX_PENALTY)
    s = jnp.where(col0, gap_i, jnp.where(row0, gap_j, 0))
    r = jnp.where(origin, 0.0, r)
    t = jnp.where(origin, 0.0, t)
    s = jnp.where(origin, 0.0, s)

    interior = (ii >= 1) & (jj >= 1)
    dsum = ii + jj

    def diag_step(d, carry):
        r, t, s = carry
        on_diag = interior & (dsum == d)
        r_left = pltpu.roll(r, 1, axis=1)  # r[i, j-1] at (i, j)
        s_left = pltpu.roll(s, 1, axis=1)
        t_up = pltpu.roll(t, 1, axis=0)  # t[i-1, j]
        s_up = pltpu.roll(s, 1, axis=0)
        s_diag = pltpu.roll(pltpu.roll(s, 1, axis=0), 1, axis=1)
        rv = jnp.maximum(r_left + EXTEND_GAP, s_left + NEW_GAP)
        tv = jnp.maximum(t_up + EXTEND_GAP, s_up + NEW_GAP)
        # reference: max(diag, rv, tv) evaluated as max(max-of-two chain);
        # all f32, order-insensitive for max
        sv = jnp.maximum(jnp.maximum(s_diag + sub, rv), tv)
        r = jnp.where(on_diag, rv, r)
        t = jnp.where(on_diag, tv, t)
        s = jnp.where(on_diag, sv, s)
        return (r, t, s)

    r, t, s = jax.lax.fori_loop(2, 2 * lm + 1, diag_step, (r, t, s))

    # pack the two decision bits in int32 (int8 shifts don't legalize in
    # Mosaic), then narrow for the output
    eq = (s == r).astype(jnp.int32) + 2 * (s == t).astype(jnp.int32)
    # boundary rows/cols never tie-break through these bits in the walk's
    # interior; the walk handles i==0 / j==0 explicitly
    eq_ref[:] = eq.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("lm", "interpret"))
def nw_batch_planes(c1, c2, *, lm: int, interpret: bool = False):
    """DP decision bitplanes for a batch of fragment pairs.

    c1, c2: (N, lm) int8 2-bit codes padded with 4 / 5 (pads must differ so
    padding never matches).  Returns (N, lm+1, lm+1) uint8 bitplanes.
    """
    n = c1.shape[0]
    lanes = _TILE_LANES[lm]
    n_pad = -(-n // lanes) * lanes
    c1p = jnp.pad(c1, ((0, n_pad - n), (0, 0)), constant_values=4).T  # (lm, Np)
    c2p = jnp.pad(c2, ((0, n_pad - n), (0, 0)), constant_values=5).T
    lp = lm + 1

    grid = (n_pad // lanes,)
    eq = pl.pallas_call(
        functools.partial(_nw_kernel, lm=lm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((lm, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((lm, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (lp, lp, lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((lp, lp, n_pad), jnp.uint8),
        interpret=interpret,
    )(c1p, c2p)
    return jnp.transpose(eq, (2, 0, 1))[:n]


def nw_backtrace(eq: np.ndarray, s1: bytes, s2: bytes) -> tuple[bytes, bytes]:
    """Reconstruct the gapped strings from one pair's decision bitplane,
    walking exactly like the reference backtrace (r first, then t;
    boundary cells: j>0&i==0 -> r-move, i>0&j==0 -> t-move, which the
    boundary init guarantees via s==r / s==t there)."""
    i, j = len(s1), len(s2)
    out1 = bytearray()
    out2 = bytearray()
    while i > 0 or j > 0:
        b = eq[i, j]
        if b & 1:
            out1.append(0x2D)
            out2.append(s2[j - 1])
            j -= 1
        elif b & 2:
            out1.append(s1[i - 1])
            out2.append(0x2D)
            i -= 1
        else:
            out1.append(s1[i - 1])
            out2.append(s2[j - 1])
            i -= 1
            j -= 1
    out1.reverse()
    out2.reverse()
    return bytes(out1), bytes(out2)


_TILES = (16, 32)  # larger fragments take the host DP (see _TILE_LANES)


def _nw_tile_batch(pairs, lm, interpret):
    from ..index.format import NT4_TABLE

    n = len(pairs)
    c1 = np.full((n, lm), 4, np.int8)
    c2 = np.full((n, lm), 5, np.int8)
    for k, (a, b) in enumerate(pairs):
        c1[k, : len(a)] = NT4_TABLE[np.frombuffer(a, np.uint8)]
        c2[k, : len(b)] = NT4_TABLE[np.frombuffer(b, np.uint8)]
        # ambiguous bases: reference compares nst_nt4 codes, N==N matches;
        # keep code 4 distinct per side only for PADDING, so remap real
        # ambiguous bases to a shared sentinel 6
        c1[k, : len(a)][c1[k, : len(a)] == 4] = 6
        c2[k, : len(b)][c2[k, : len(b)] == 4] = 6
    eq = np.asarray(
        nw_batch_planes(jnp.asarray(c1), jnp.asarray(c2), lm=lm, interpret=interpret)
    )
    return [nw_backtrace(eq[k], a, b) for k, (a, b) in enumerate(pairs)]


def nw_align_batch(pairs: list[tuple[bytes, bytes]], *, interpret=None):
    """Align a batch of (s1, s2) ASCII fragment pairs on the device;
    returns gapped (a1, a2) string pairs, each bit-identical to
    pipeline.conquer.nw_alignment(s1, s2).

    Pairs are grouped into size-bucketed tile batches; pairs exceeding the
    largest tile (possible only on degenerate PacBio fragments — callers
    keep NW inputs small via 8-mer repartition / recursion) fall back to
    the host DP."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not pairs:
        return []
    buckets: dict[int, list[int]] = {}
    host_idx = []
    for k, (a, b) in enumerate(pairs):
        m = max(len(a), len(b))
        t = next((t for t in _TILES if t >= m), None)
        if t is None:
            host_idx.append(k)
        else:
            buckets.setdefault(t, []).append(k)
    out: list = [None] * len(pairs)
    for t, idxs in sorted(buckets.items()):
        res = _nw_tile_batch([pairs[k] for k in idxs], t, interpret)
        for k, r in zip(idxs, res):
            out[k] = r
    from ..pipeline.conquer import nw_alignment

    for k in host_idx:
        out[k] = nw_alignment(*pairs[k])
    return out
