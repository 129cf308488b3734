"""Random-gather microbenchmark: XLA formulations vs Pallas (VERDICT r4 #5).

The device seeding scan's floor is the per-round suffix-array hit gather:
H random int32 loads from the ~37 MB sa_full array (XLA lowers a
big-source random gather to a serialized scalar loop, one HBM latency per
element).  Same-shape gathers from SMALL sources are much faster (the
source stays in VMEM).  This bench quantifies every formulation
considered:

  flat         x[idx]                 H random elements, big source
  sorted_flat  x[sort(idx)]           locality-sorted indices (cache test)
  row_R        x2d[idx_r]             H_r random ROWS of R elements
                                      (slice_sizes (1,R)): fewer latencies
                                      for run-structured indices
  two_level_R  rows = x2d[idx_r]; y = rows[pos, off]
                                      the production candidate: big-source
                                      row gather + small-source re-gather
  small        s[idx]                 H elements from a 512 KB source
  pallas_dma   per-row double-buffered DMA HBM->VMEM (8 in flight)

Indices are run-structured like the scan's (contiguous runs at random
starts).  Each rep gathers a DIFFERENT index set: identical dispatches
were observed to be de-duplicated through the relay.

Run on the real chip:  python tools/bench_gather.py [--h 16384]
Prints one JSON line per formulation with ns/element and effective GB/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NV = 8  # index-set variants cycled across inner iterations


def make_looped(gather_one):
    """gather_one(k) -> (H',) or (H', R) device values for variant k (traced).
    Returns looped(n): a jitted fn running n gathers (variant k = i % NV
    each iteration, so no two consecutive iterations are CSE-able) and
    returning an O(1) checksum."""
    import jax
    import jax.numpy as jnp
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def looped(n):
        def body(i, acc):
            vals = gather_one(jax.lax.rem(i, NV))
            # FULL reduction: consuming only an element or two lets XLA
            # shrink the gather itself (observed: a [0]/[-1] checksum made
            # every formulation report ~13 ns/elem regardless of shape)
            return acc + vals.astype(jnp.int32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    return looped


def time_slope(gather_one, n_small=8, n_big=136):
    """Per-gather time by slope between an n_small-iteration and an
    n_big-iteration on-device loop (the relay's fixed dispatch + d2h costs
    cancel; the loop keeps every gather on device)."""
    looped = make_looped(gather_one)
    np.asarray(looped(n_small))  # compile both shapes
    np.asarray(looped(n_big))
    ts, tb = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(looped(n_small))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(looped(n_big))
        tb.append(time.perf_counter() - t0)
    return max(min(tb) - min(ts), 0.0) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=16384, help="hit count per round")
    ap.add_argument("--n", type=int, default=9_279_361, help="table entries")
    ap.add_argument("--runs", type=int, default=4096, help="distinct runs (lanes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    H, N = args.h, args.n
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, N, size=N, dtype=np.int32))

    # NV variants of run-structured indices (runs of H/runs at random starts)
    idx_v = []
    for _ in range(NV):
        starts = np.sort(rng.integers(0, N - 64, size=args.runs))
        lens = np.full(args.runs, H // args.runs, np.int32)
        lens[: H % args.runs] += 1
        idx = np.concatenate([s + np.arange(l) for s, l in zip(starts, lens)])[:H]
        idx_v.append(idx.astype(np.int32))

    results = []

    def report(name, t, count, bytes_useful):
        results.append({
            "formulation": name,
            "ns_per_elem": round(1e9 * t / H, 2),
            "us_total": round(1e6 * t, 1),
            "gather_latencies": int(count),
            "ns_per_latency": round(1e9 * t / max(count, 1), 1),
            "useful_GBps": round(bytes_useful / max(t, 1e-12) / 1e9, 2),
        })
        print(json.dumps(results[-1]))

    def stack(vs):
        return jnp.asarray(np.stack(vs))

    def pick(arr, k):
        return jax.lax.dynamic_index_in_dim(arr, k, 0, keepdims=False)

    # --- flat big-source gather (the current production formulation) ---
    idx_all = stack(idx_v)
    report("flat", time_slope(lambda k: table[pick(idx_all, k)]), H, 4 * H)

    sidx_all = stack([np.sort(v) for v in idx_v])
    report("sorted_flat", time_slope(lambda k: table[pick(sidx_all, k)]), H, 4 * H)

    # --- row gathers + two-level, R in {8, 16, 32} ---
    for R in (8, 16, 32):
        NR = N // R
        t2 = table[: NR * R].reshape(NR, R)
        rid_v, pos_v, off_v, HR = [], [], [], 0
        for v in idx_v:
            rid = np.unique(v // R).astype(np.int32)
            rid_v.append(rid)
            pos_v.append(np.searchsorted(rid, v // R).astype(np.int32))
            off_v.append((v % R).astype(np.int32))
            HR = max(HR, len(rid))
        HR = 1 << int(np.ceil(np.log2(HR + 1)))
        rid_all = stack([np.pad(r, (0, HR - len(r))) for r in rid_v])
        pos_all = stack(pos_v)
        off_all = stack(off_v)

        report(
            f"row_{R}",
            time_slope(lambda k, t2=t2, rid_all=rid_all: t2[pick(rid_all, k)]),
            HR, 4 * H,
        )

        def two(k, t2=t2, rid_all=rid_all, pos_all=pos_all, off_all=off_all):
            rows = t2[pick(rid_all, k)]
            return rows[pick(pos_all, k), pick(off_all, k)]

        report(f"two_level_{R}", time_slope(two), HR, 4 * H)

    # --- gather-free formulations for SMALL tables (the scan's per-lane
    # pickups gather H=16384 values from B=4096-entry tables): select-
    # reduce generates the one-hot on the fly inside a fused reduction;
    # onehot-matmul rides the MXU in f32 ---
    NTB = 4096
    tbl_small = jnp.asarray(rng.integers(0, 2**20, size=NTB, dtype=np.int32))
    si_all = stack([rng.integers(0, NTB, size=H).astype(np.int32) for _ in range(NV)])
    ar_tb = jnp.arange(NTB, dtype=jnp.int32)

    def selred(k):
        idx = pick(si_all, k)
        return jnp.where(idx[:, None] == ar_tb[None, :], tbl_small[None, :], 0).sum(1)

    report(f"selreduce_{NTB}", time_slope(selred), H, 4 * H)

    def onehot_mxu(k):
        idx = pick(si_all, k)
        oh = (idx[:, None] == ar_tb[None, :]).astype(jnp.bfloat16)
        return jnp.dot(oh, tbl_small.astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(jnp.int32)

    report(f"onehot_mxu_{NTB}", time_slope(onehot_mxu), H, 4 * H)

    # --- small-source gather (512 KB) ---
    small = jnp.asarray(rng.integers(0, 2**31 - 1, size=131072, dtype=np.int32))
    sm_all = stack([rng.integers(0, 131072, size=H).astype(np.int32) for _ in range(NV)])
    report("small_512KB", time_slope(lambda k: small[pick(sm_all, k)]), H, 4 * H)

    # --- Pallas: per-row DMA, NBUF in flight ---
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        R = 128  # one tile row per DMA
        NR = N // R
        t2p = table[: NR * R].reshape(NR, R)
        ridp_v = []
        HRp = 0
        for v in idx_v:
            rid = np.unique(v // R).astype(np.int32)
            ridp_v.append(rid)
            HRp = max(HRp, len(rid))
        HRp = 1 << int(np.ceil(np.log2(HRp + 1)))
        ridp_all = stack([np.pad(r, (0, HRp - len(r))) for r in ridp_v])
        NBUF = 8

        def kernel(rid_ref, hbm_ref, out_ref):
            def body(scratch, sems):
                def get(slot, i):
                    return pltpu.make_async_copy(
                        hbm_ref.at[pl.ds(rid_ref[i], 1), :],
                        scratch.at[pl.ds(slot, 1), :],
                        sems.at[slot],
                    )

                for i in range(NBUF):
                    get(i, i).start()

                def loop(i, _):
                    slot = jax.lax.rem(i, NBUF)
                    get(slot, i).wait()
                    out_ref[pl.ds(i, 1), :] = scratch[pl.ds(slot, 1), :]

                    @pl.when(i + NBUF < HRp)
                    def _():
                        get(jax.lax.rem(i + NBUF, NBUF), i + NBUF).start()

                    return 0

                jax.lax.fori_loop(0, HRp, loop, 0)

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((NBUF, R), jnp.int32),
                sems=pltpu.SemaphoreType.DMA((NBUF,)),
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        def f_pallas(k):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((HRp, R), jnp.int32),
            )(pick(ridp_all, k), t2p)

        report(f"pallas_dma_row{R}x{NBUF}", time_slope(f_pallas), HRp, 4 * H)
    except Exception as e:
        print(json.dumps({"formulation": "pallas_dma", "error": f"{type(e).__name__}: {e}"[:300]}))

    return results


if __name__ == "__main__":
    main()
