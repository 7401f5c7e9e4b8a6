"""BVec unit tests: get_range parity vs a probe of the reference bvec (2000
real lengths, every center query), plus structural behaviors."""
import os

import numpy as np
import pytest

from meshclust2_tpu.cluster.bvec import BVec


def test_get_range_parity_fixture(fixtures_dir):
    lengths = np.loadtxt(os.path.join(fixtures_dir, "bvec_lens2000.txt"), dtype=np.int64)
    bv = BVec(lengths, 1000)
    for row, l in enumerate(lengths):
        bv.insert(row, int(l))
    bv.insert_finalize(lengths)
    sim = 0.9
    with open(os.path.join(fixtures_dir, "bvec_ranges2000.txt")) as f:
        for line in f:
            parts = line.split()
            l = int(parts[1])
            want = tuple(int(x) if int(x) < 2**63 else -1 for x in parts[2:])
            front, back, be = bv.get_range(int(l * sim), int(l / sim))
            got = (front[0], front[1], back[0], back[1], int(be))
            assert got == want, (l, got, want)


def test_bin_structure():
    lengths = np.arange(100, 2100)  # 2000 distinct lengths
    bv = BVec(lengths, 1000)
    assert bv.begin_bounds == [100, 1100]
    for row, l in enumerate(lengths):
        bv.insert(row, int(l))
    bv.insert_finalize(lengths)
    assert bv.size() == 2000
    # bins sorted by length
    for b in bv.bins:
        ls = lengths[b]
        assert (np.diff(ls) >= 0).all()


def test_pop_erase_remove():
    lengths = np.array([10, 20, 30, 40, 50] * 4)
    bv = BVec(lengths, 1000)
    for row, l in enumerate(lengths):
        bv.insert(row, int(l))
    bv.insert_finalize(lengths)
    first = bv.pop()
    assert int(lengths[first]) == 10
    rows, bins, slots = bv.window((0, 0), (0, bv.size()))
    assert len(rows) == 19
    # mark half, remove
    bv.mark_slots(bins[:5], slots[:5])
    out = bv.remove_available((0, 0), (0, 0))
    assert len(out) == 5
    assert bv.size() == 14


def test_out_of_range_begin_falls_to_last_bin():
    """begin length below the smallest bound resolves front to the last bin
    (the reference's index_of initialization quirk)."""
    lengths = np.concatenate([np.full(1000, 100), np.full(1000, 1000)])
    bv = BVec(lengths, 1000)
    for row, l in enumerate(lengths):
        bv.insert(row, int(l))
    bv.insert_finalize(lengths)
    front, back, be = bv.get_range(50, 120)
    assert front[0] == len(bv.bins) - 1
    rows, _, _ = bv.window(front, back)
    assert len(rows) == 0  # empty window -> the singleton-cluster quirk
