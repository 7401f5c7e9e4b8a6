"""Native accumulate driver (native/accumulate.cpp) parity: the one-call
C++ loop must produce byte-identical clusters (centers, members, member
order) and identical scan statistics to the Python engine loop it replaces
(cluster/engine.py accumulate path), which is itself reference-exact."""
import os

import numpy as np
import pytest

from meshclust2_tpu.cluster.bvec import BVec
from meshclust2_tpu.cluster.engine import MeanShiftEngine
from meshclust2_tpu.kmer.counting import build_point_set
from meshclust2_tpu.io.fasta import read_fasta
from meshclust2_tpu.model.classifier import CompiledModel
from meshclust2_tpu.model.weights import load_weights
from meshclust2_tpu.native import NativeScorer


def _load(fixtures_dir):
    w = load_weights(os.path.join(fixtures_dir, "med2000_weights.txt"))
    recs = read_fasta(os.path.join(fixtures_dir, "med2000.fasta"), False)
    ps = build_point_set(recs, w.k, w.datatype, keep_seqs=False)
    order = np.argsort(ps.lengths, kind="stable")
    ps = ps.subset(order)
    ps.ids = np.arange(ps.n, dtype=np.int64)
    model = CompiledModel(w.classifier)
    return ps, model, w


def _accumulate(ps, model, sim, force_python):
    scorer = NativeScorer.create(ps, model)
    if scorer is None:
        pytest.skip("native library unavailable")
    eng = MeanShiftEngine(ps, model, sim, scorer=scorer)
    env = {}
    if force_python:
        env["MC2_NO_NATIVE_ACCUMULATE"] = "1"
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        bv = BVec(ps.lengths, 1000)
        for row in range(ps.n):
            bv.insert(row, int(ps.lengths[row]))
        bv.insert_finalize(ps.lengths)
        clusters = eng.accumulate_all(bv)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return clusters, eng.stats


@pytest.mark.parametrize("bin_size", [1000])
def test_native_accumulate_matches_python(fixtures_dir, bin_size):
    ps, model, w = _load(fixtures_dir)
    nat, nat_stats = _accumulate(ps, model, w.id_cutoff, force_python=False)
    py, py_stats = _accumulate(ps, model, w.id_cutoff, force_python=True)
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        assert a.center_row == b.center_row
        assert list(a.members) == list(b.members)
    assert nat_stats.windows_scored == py_stats.windows_scored
    assert nat_stats.pairs_scored == py_stats.pairs_scored


def test_native_accumulate_small_bins(fixtures_dir):
    # small bin_size exercises the multi-bin window walk, the below-all-
    # bounds last-bin quirk, and cross-bin marked removal
    ps, model, w = _load(fixtures_dir)
    scorer = NativeScorer.create(ps, model)
    if scorer is None:
        pytest.skip("native library unavailable")

    def run(force_python):
        eng = MeanShiftEngine(ps, model, w.id_cutoff, scorer=scorer,
                              bin_size=97)
        bv = BVec(ps.lengths, 97)
        for row in range(ps.n):
            bv.insert(row, int(ps.lengths[row]))
        bv.insert_finalize(ps.lengths)
        if force_python:
            os.environ["MC2_NO_NATIVE_ACCUMULATE"] = "1"
        try:
            return eng.accumulate_all(bv)
        finally:
            os.environ.pop("MC2_NO_NATIVE_ACCUMULATE", None)

    nat = run(False)
    py = run(True)
    assert [c.center_row for c in nat] == [c.center_row for c in py]
    assert [list(c.members) for c in nat] == [list(c.members) for c in py]


def test_native_update_matches_python(fixtures_dir):
    """The native update/merge driver (native/update.cpp) must produce the
    same final clusters, member order, and statistics as the Python
    update_phase (memo path) from the same accumulated state."""
    import copy

    ps, model, w = _load(fixtures_dir)
    clusters, _ = _accumulate(ps, model, w.id_cutoff, force_python=False)
    scorer = NativeScorer.create(ps, model)

    def run_update(cl, force_python):
        eng = MeanShiftEngine(ps, model, w.id_cutoff, scorer=scorer)
        if force_python:
            os.environ["MC2_NO_NATIVE_UPDATE"] = "1"
        try:
            eng.update_phase(cl)
        finally:
            os.environ.pop("MC2_NO_NATIVE_UPDATE", None)
        return cl, eng.stats

    nat, nat_stats = run_update(copy.deepcopy(clusters), False)
    py, py_stats = run_update(copy.deepcopy(clusters), True)
    assert [c.center_row for c in nat] == [c.center_row for c in py]
    assert [list(c.members) for c in nat] == [list(c.members) for c in py]
    assert nat_stats.update_iterations == py_stats.update_iterations
    assert nat_stats.pairs_scored == py_stats.pairs_scored
