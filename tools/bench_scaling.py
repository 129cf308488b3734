"""Mesh scaling curve for the device seeding step (the scaling-efficiency
proxy for the >=80%-at-2-hosts target: no multi-chip hardware is attached,
so the curve is measured on the virtual CPU mesh, where the 2 physical
cores bound absolute numbers but the per-device work split is real).

Measures the jitted data-parallel mapping step (parallel/dp.py) at 1/2/4/8
data shards on a fixed total batch, and the sharded-index mode at data x
idx = 4x2, and prints one JSON line per configuration.

Usage: python tools/bench_scaling.py  (forces the cpu platform + 8 virtual
devices itself)."""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import __graft_entry__ as g
    from kart_tpu.parallel import make_data_mesh, make_mapping_step

    gidx = g._tiny_index()
    rlen, min_seed = 128, 13
    max_seeds = rlen // (min_seed + 1) + 1
    B = 2048
    reads, rlens = g._example_reads(gidx, B, rlen, seed=3)
    results = []
    for n_data, n_idx in ((1, 1), (2, 1), (4, 1), (8, 1), (4, 2)):
        mesh = make_data_mesh(n_data, n_idx)
        step, place = make_mapping_step(
            mesh, gidx, idx_axis="idx" if n_idx > 1 else None,
            min_seed_len=min_seed, max_seeds=max_seeds, l_max=rlen,
        )
        r, rl = place(reads, rlens)
        jax.block_until_ready(step(r, rl))  # compile + warm
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(step(r, rl))
            rates.append(B / (time.perf_counter() - t0))
        rec = dict(
            config=f"data={n_data}" + (f",idx={n_idx}" if n_idx > 1 else ""),
            reads_per_sec=round(max(rates), 1),
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)
    base = results[0]["reads_per_sec"]
    for rec in results[1:]:
        n = int(rec["config"].split("=")[1].split(",")[0])
        eff = rec["reads_per_sec"] / (base * n)
        print(json.dumps({"config": rec["config"],
                          "scaling_efficiency_vs_1": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
