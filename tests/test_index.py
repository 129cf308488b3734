"""Index construction tests: self-consistency and byte-parity with the
reference indexer."""

import numpy as np
import pytest

from kart_tpu.index import build_index, load_index
from kart_tpu.native import suffix_array
from kart_tpu.ops.fm_ref import fm_from_genome_index

from conftest import make_genome, needs_reference, run_reference_indexer


def test_suffix_array_small():
    rng = np.random.default_rng(0)
    for n in [1, 2, 5, 17, 100, 1000]:
        text = rng.integers(1, 5, size=n).astype(np.uint8)
        sa = suffix_array(text)
        s = np.concatenate([text, [0]])
        expected = sorted(range(len(s)), key=lambda i: s[i:].tobytes())
        assert sa.tolist() == expected, f"n={n}"


def test_index_build_and_selfcheck(workdir):
    rng = np.random.default_rng(7)
    fa = workdir / "tiny.fa"
    fa.write_text(make_genome(rng, [5000], n_runs=1))
    prefix = workdir / "tinyidx"
    build_index(str(fa), str(prefix), verbose=False)
    gidx = load_index(str(prefix))
    assert gidx.genome_size == 5000
    assert gidx.seq_len == 10000
    # FM search finds true exact matches
    fm = fm_from_genome_index(gidx)
    codes = gidx.ref_codes
    for start in [0, 100, 1234, 4000]:
        seg = codes[start : start + 40]
        length, freq, locs = fm.search(seg, 0, 40, 13)
        assert length == 40
        assert freq >= 1
        assert start in locs.tolist()
        # every reported location is a true occurrence
        for loc in locs:
            assert np.array_equal(codes[loc : loc + 40], seg)


@needs_reference
def test_index_byte_parity_with_reference(small_genome, workdir):
    ours = workdir / "ours_idx"
    theirs = workdir / "ref_idx"
    build_index(str(small_genome), str(ours), verbose=False)
    run_reference_indexer(small_genome, theirs)
    for ext in [".pac", ".ann", ".amb", ".bwt", ".sa"]:
        a = (workdir / ("ours_idx" + ext)).read_bytes()
        b = (workdir / ("ref_idx" + ext)).read_bytes()
        assert a == b, f"{ext} differs: {len(a)} vs {len(b)} bytes"


@needs_reference
def test_index_parity_with_ns_and_multichrom(workdir):
    rng = np.random.default_rng(99)
    fa = workdir / "multi.fa"
    fa.write_text(make_genome(rng, [30000, 20000, 9999], n_runs=4))
    ours = workdir / "ours_multi"
    theirs = workdir / "ref_multi"
    build_index(str(fa), str(ours), verbose=False)
    run_reference_indexer(fa, theirs)
    for ext in [".pac", ".ann", ".amb", ".bwt", ".sa"]:
        a = (workdir / ("ours_multi" + ext)).read_bytes()
        b = (workdir / ("ref_multi" + ext)).read_bytes()
        assert a == b, f"{ext} differs"
