"""Worker process for the genuine 2-process jax.distributed test
(test_multihost.py::test_two_process_jax_distributed).

Each worker: initializes the jax.distributed process group against the
coordinator, proves the group with a cross-process allgather, then maps its
input shard with exact sequential stat semantics via the TCP stat relay
(kart_tpu.parallel.stats_sync) and writes a SAM shard."""

import json
import sys


def main():
    cfg = json.load(open(sys.argv[1]))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=cfg["coordinator"],
        num_processes=cfg["nprocs"],
        process_id=cfg["pid"],
    )
    assert jax.process_count() == cfg["nprocs"], jax.process_count()
    assert jax.process_index() == cfg["pid"]
    import numpy as np
    from jax.experimental import multihost_utils

    got = multihost_utils.process_allgather(np.array([cfg["pid"]]))
    assert sorted(np.asarray(got).ravel().tolist()) == list(range(cfg["nprocs"])), got

    sys.path.insert(0, cfg["repo"])
    from kart_tpu.index import load_index
    from kart_tpu.parallel.stats_sync import SocketStatRelay, map_shard
    from kart_tpu.pipeline.mapper import KartMapper

    gidx = load_index(cfg["prefix"])
    mapper = KartMapper(gidx)
    relay = SocketStatRelay(cfg["relay_host"], cfg["relay_port"])
    counters = {}
    with open(cfg["out"], "w") as f:
        map_shard(mapper, cfg["r1"], cfg["r2"], True, True, relay,
                  cfg["first_chunk"], f.write, counters)
    relay.close()
    print(f"WORKER_OK pid={cfg['pid']} {counters}", flush=True)


if __name__ == "__main__":
    main()
