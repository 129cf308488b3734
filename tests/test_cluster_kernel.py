"""Device candidate clustering vs the host reference implementation."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_gidx():
    import __graft_entry__ as g

    return g._tiny_index()


def _random_seed_lists(gidx, rng, n_reads, rlen):
    from kart_tpu.pipeline.candidates import Seed, sort_by_posdiff

    lists = []
    for _ in range(n_reads):
        k = int(rng.integers(0, 9))
        seeds = []
        for _ in range(k):
            ln = int(rng.integers(13, min(40, rlen)))
            rp = int(rng.integers(0, rlen - ln))
            gp = int(rng.integers(0, gidx.two_genome_size - ln))
            # bias some seeds into tight posdiff groups so clusters form
            if seeds and rng.random() < 0.6:
                gp = min(
                    max(seeds[-1].gpos + rp - seeds[-1].rpos + int(rng.integers(-3, 4)), 0),
                    gidx.two_genome_size - ln,
                )
            seeds.append(Seed(True, rp, gp, ln, ln, gp - rp))
        sort_by_posdiff(seeds)
        lists.append(seeds)
    return lists


def test_device_clustering_matches_host(tiny_gidx):
    from kart_tpu.ops.cluster import cluster_batch_to_candidates
    from kart_tpu.pipeline.candidates import gen_candidates_illumina

    rng = np.random.default_rng(17)
    rlen = 120
    lists = _random_seed_lists(tiny_gidx, rng, 200, rlen)
    got = cluster_batch_to_candidates(tiny_gidx, lists, [rlen] * len(lists), 5)
    for b, seeds in enumerate(lists):
        seeds_copy = [type(s)(s.simple, s.rpos, s.gpos, s.rlen, s.glen, s.posdiff)
                      for s in seeds]
        want = gen_candidates_illumina(rlen, seeds_copy, tiny_gidx, 5)
        g = [(c.score, c.posdiff, [(s.rpos, s.gpos, s.rlen) for s in c.seeds]) for c in got[b]]
        w = [(c.score, c.posdiff, [(s.rpos, s.gpos, s.rlen) for s in c.seeds]) for c in want]
        assert g == w, (b, g, w)
