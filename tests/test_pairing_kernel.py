"""Device PE mating scan vs the host reference implementation."""

import numpy as np


def _rand_cands(rng, n):
    from kart_tpu.pipeline.candidates import Candidate

    out = []
    for _ in range(n):
        c = Candidate(score=int(rng.integers(1, 120)), posdiff=int(rng.integers(0, 3000)))
        out.append(c)
    return out


def test_device_pairing_matches_host():
    from kart_tpu.ops.pairing import pair_chunk_on_device
    from kart_tpu.pipeline.pairing import check_paired_candidates

    rng = np.random.default_rng(23)
    est = 1500
    for trial in range(60):
        n1 = int(rng.integers(0, 7))
        n2 = int(rng.integers(0, 7))
        a = _rand_cands(rng, n1)
        b = _rand_cands(rng, n2)
        # clone for host run
        import copy

        ah, bh = copy.deepcopy(a), copy.deepcopy(b)
        want_flag = check_paired_candidates(est, ah, bh)
        got = pair_chunk_on_device(est, [(a, b)])
        assert got[0] == want_flag, trial
        assert [c.paired_idx for c in a] == [c.paired_idx for c in ah], trial
        assert [c.paired_idx for c in b] == [c.paired_idx for c in bh], trial


def test_device_pairing_tie_and_steal():
    from kart_tpu.ops.pairing import pair_chunk_on_device
    from kart_tpu.pipeline.candidates import Candidate

    # two read-1 candidates compete for the same mate; higher score steals
    a = [Candidate(score=10, posdiff=100), Candidate(score=20, posdiff=100)]
    b = [Candidate(score=30, posdiff=200)]
    flags = pair_chunk_on_device(1500, [(a, b)])
    assert flags == [True]
    assert a[0].paired_idx == -1 and a[1].paired_idx == 0
    assert b[0].paired_idx == 1

    # tie among mates -> no link for that candidate
    a = [Candidate(score=10, posdiff=100)]
    b = [Candidate(score=30, posdiff=200), Candidate(score=30, posdiff=300)]
    flags = pair_chunk_on_device(1500, [(a, b)])
    assert flags == [False]
    assert a[0].paired_idx == -1
