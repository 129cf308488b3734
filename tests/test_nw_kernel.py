"""Pallas batched NW kernel vs the host reference DP (bit-exact)."""

import numpy as np
import pytest

from kart_tpu.pipeline.conquer import nw_alignment


def random_pairs(n, rng, max_len=30, err=0.15, with_n=False):
    pairs = []
    for _ in range(n):
        la = int(rng.integers(1, max_len + 1))
        a = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=la)
        # derive b from a with subs/indels so alignments are non-trivial
        b = []
        for c in a:
            r = rng.random()
            if r < err * 0.4:
                continue  # deletion
            if r < err * 0.7:
                b.append(int(rng.choice(np.frombuffer(b"ACGT", np.uint8))))
            else:
                b.append(int(c))
            if rng.random() < err * 0.3:
                b.append(int(rng.choice(np.frombuffer(b"ACGT", np.uint8))))
        if not b:
            b = [int(a[0])]
        a = a.tobytes()
        b = bytes(b)
        if with_n and rng.random() < 0.5:
            a = a[: la // 2] + b"N" + a[la // 2 :]
        pairs.append((a, b[:max_len]))
    return pairs


def test_nw_kernel_matches_host():
    from kart_tpu.ops.nw import nw_align_batch

    rng = np.random.default_rng(7)
    pairs = random_pairs(300, rng)
    got = nw_align_batch(pairs)
    for k, (a, b) in enumerate(pairs):
        want = nw_alignment(a, b)
        assert got[k] == want, (k, a, b, got[k], want)


def test_nw_kernel_ambiguous_and_sizes():
    from kart_tpu.ops.nw import nw_align_batch

    rng = np.random.default_rng(11)
    pairs = random_pairs(40, rng, max_len=60, with_n=True)
    pairs += [(b"A", b"A"), (b"A", b"T"), (b"ACGT", b"A"), (b"A", b"ACGT")]
    got = nw_align_batch(pairs)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == nw_alignment(a, b), (k, a, b)


def test_nw_kernel_empty_batch():
    from kart_tpu.ops.nw import nw_align_batch

    assert nw_align_batch([]) == []


def test_nw_wavefront_tiles_match_host():
    """64/128 wavefront tiles (PacBio conquer fragment sizes) bit-match the
    host DP, including coverage accounting."""
    from kart_tpu.ops.nw import nw_align_batch, nw_stats

    rng = np.random.default_rng(13)
    pairs = random_pairs(48, rng, max_len=64)
    pairs += random_pairs(24, rng, max_len=128)
    pairs += [(b"A" * 64, b"A" * 33), (b"ACGT" * 32, b"ACGT" * 16)]
    before = dict(nw_stats)
    got = nw_align_batch(pairs)
    assert nw_stats["device"] - before["device"] == len(pairs)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == nw_alignment(a, b), (k, len(a), len(b))


def test_nw_beyond_tiles_host_fallback():
    from kart_tpu.ops.nw import nw_align_batch, nw_stats

    rng = np.random.default_rng(17)
    pairs = random_pairs(4, rng, max_len=200)
    pairs = [p for p in pairs if max(len(p[0]), len(p[1])) > 128] or [
        (b"ACGT" * 40, b"ACGT" * 35)
    ]
    before = dict(nw_stats)
    got = nw_align_batch(pairs)
    assert nw_stats["host"] - before["host"] == len(pairs)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == nw_alignment(a, b)
