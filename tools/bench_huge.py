"""Human-scale (i64) throughput bench: the 1.1 Gbp / 2.2e9-text index.

VERDICT r4 #7: every r4 perf number was E. coli-scale; this measures the
i64 configuration — the kmer direct tables gate out (text > KART_KMER_GATE)
so device seeding runs the batched FM scan + sampled-SA walks, and the
native path runs the C++ FM seeder — on whatever genome the huge fixture
provides.  Requires tests/_work/huge assets (KART_HUGE_TESTS=1 pytest
tests/test_huge_genome.py builds them).

    python tools/bench_huge.py [--reads 20000]

Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
HUGE = os.path.join(REPO, "tests", "_work", "huge")


def run():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=20000)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    prefix = os.path.join(HUGE, "idx")
    if not os.path.exists(prefix + ".bwt"):
        print(json.dumps({"error": "huge assets missing; run KART_HUGE_TESTS=1 pytest tests/test_huge_genome.py first"}))
        return 1
    fa = os.path.join(HUGE, "huge.fa")
    r1 = os.path.join(HUGE, "bench_h1.fq")
    r2 = os.path.join(HUGE, "bench_h2.fq")
    if not os.path.exists(r1):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from simulate_reads import simulate

        simulate(fa, r1, r2, n_reads=args.reads, read_len=150, seed=71)

    from kart_tpu.index import load_index
    from kart_tpu.pipeline.mapper import KartMapper

    gidx = load_index(prefix)
    results = []
    for mode, env in (("native_fm", {}),
                      ("device_i64", {"KART_SEED_MODE": "device"})):
        for k, v in env.items():
            os.environ[k] = v
        try:
            m = KartMapper(gidx)
            m.map_stream(r1, r2, True, True, lambda s: None)  # prime
            rates = []
            for _ in range(args.passes):
                t0 = time.time()
                tot0 = m.stats["total"]
                m.map_stream(r1, r2, True, True, lambda s: None)
                rates.append((m.stats["total"] - tot0) / (time.time() - t0))
            rec = {
                "metric": f"huge_genome_reads_per_sec_{mode}",
                "value": round(statistics.median(rates), 1),
                "unit": "reads/s",
                "genome": "1.1 Gbp (2.2e9 text, i64 index)",
                "spread": [round(min(rates), 1), round(max(rates), 1)],
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"metric": f"huge_genome_reads_per_sec_{mode}",
                              "error": f"{type(e).__name__}: {e}"[:200]}), flush=True)
        finally:
            for k in env:
                os.environ.pop(k, None)
    return 0


if __name__ == "__main__":
    sys.exit(run())
