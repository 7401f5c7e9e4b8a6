"""End-to-end recover-path parity: our mean-shift engine must reproduce the
reference binary's CLSTR output (cluster membership and centers) on the
golden fixture, using the reference-trained weights."""
import os
import subprocess
import sys

import pytest

from meshclust2_tpu.io.clstr import parse_clstr


def cluster_signature(clusters):
    memb = sorted(frozenset(m["header"] for m in c) for c in clusters)
    cent = sorted(
        (
            frozenset(m["header"] for m in c),
            tuple(sorted(m["header"] for m in c if m["center"])),
        )
        for c in clusters
    )
    return memb, cent


@pytest.mark.parametrize("device", ["host"])
def test_recover_clstr_parity(fixtures_dir, tmp_path, device):
    out = tmp_path / "out.clstr"
    from meshclust2_tpu.cli import main

    rc = main(
        [
            "--recover",
            os.path.join(fixtures_dir, "small_ref_weights.txt"),
            "--output",
            str(out),
            "--device",
            device,
            os.path.join(fixtures_dir, "small.fasta"),
        ]
    )
    assert rc == 0
    ref = parse_clstr(os.path.join(fixtures_dir, "small_ref.clstr"))
    got = parse_clstr(str(out))
    assert len(got) == len(ref)
    ref_m, ref_c = cluster_signature(ref)
    got_m, got_c = cluster_signature(got)
    assert got_m == ref_m, "cluster memberships differ from reference"
    assert got_c == ref_c, "cluster centers differ from reference"


def test_score_memo_exact_reuse():
    # _ScoreMemo must return bit-identical values for repeated (a, b) keys
    # and never confuse ordered pairs, across interleaved hit/miss batches.
    import numpy as np
    from meshclust2_tpu.cluster.engine import _ScoreMemo

    class CountingScorer:
        def __init__(self):
            self.calls = 0
            self.pairs = 0

        def score(self, a, b):
            a = np.asarray(a); b = np.asarray(b)
            self.calls += 1
            self.pairs += len(a)
            # deterministic, order-sensitive fake scores
            return (a * 1000.0 + b) * 1e-7, (b * 1000.0 + a) * 1e-3

    base = CountingScorer()
    memo = _ScoreMemo(base, n=10_000)
    rng = np.random.default_rng(3)
    seen = {}
    for _ in range(30):
        m = int(rng.integers(1, 400))
        a = rng.integers(0, 200, m)
        b = rng.integers(0, 200, m)
        prob, dist = memo.score(a, b)
        ref_p, ref_d = base.score(a, b)  # stateless fake -> safe to recall
        np.testing.assert_array_equal(prob, ref_p)
        np.testing.assert_array_equal(dist, ref_d)
        for x, y in zip(a, b):
            seen[(int(x), int(y))] = True
    # a fresh query over known keys must come from the store, bit-identical
    keys = np.array([k for k in list(seen)[:50]])
    p2, d2 = memo.score(keys[:, 0], keys[:, 1])
    rp, rd = CountingScorer().score(keys[:, 0], keys[:, 1])
    np.testing.assert_array_equal(p2, rp)
    np.testing.assert_array_equal(d2, rd)


def test_score_memo_broadcast_and_dupes():
    import numpy as np
    from meshclust2_tpu.cluster.engine import _ScoreMemo

    class S:
        def score(self, a, b):
            a = np.asarray(a, dtype=np.float64); b = np.asarray(b, dtype=np.float64)
            return a + b / 10.0, a - b

    memo = _ScoreMemo(S(), n=100)
    # broadcast single center
    p, d = memo.score(np.array([1, 2, 3]), np.array([7]))
    np.testing.assert_array_equal(p, [1.7, 2.7, 3.7])
    # duplicate keys within one batch
    p, d = memo.score(np.array([5, 5, 5]), np.array([6, 6, 6]))
    np.testing.assert_array_equal(p, [5.6, 5.6, 5.6])
    # ordered pairs are distinct keys
    p_ab, _ = memo.score(np.array([1]), np.array([2]))
    p_ba, _ = memo.score(np.array([2]), np.array([1]))
    assert p_ab[0] != p_ba[0]
