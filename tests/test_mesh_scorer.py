"""MeshScorer: the engine's Scorer protocol over an 8-device mesh must make
the same clustering decisions as the float64 host scorer."""
import os

import numpy as np
import pytest

import jax

from meshclust2_tpu.cli import load_sorted_points
from meshclust2_tpu.cluster.engine import HostScorer, MeanShiftEngine
from meshclust2_tpu.model.classifier import CompiledModel
from meshclust2_tpu.model.weights import load_weights
from meshclust2_tpu.parallel.mesh_scorer import MeshScorer


@pytest.fixture(scope="module")
def setup(fixtures_dir):
    w = load_weights(os.path.join(fixtures_dir, "small_ref_weights.txt"))
    _, ps = load_sorted_points(
        [os.path.join(fixtures_dir, "small.fasta")], [], w.k, w.datatype, False
    )
    model = CompiledModel(w.classifier)
    return w, ps, model


def test_create_requires_supported_singles(setup):
    w, ps, model = setup
    sc = MeshScorer.create(ps, model)
    assert sc is not None  # the golden model's singles are all supported


def test_decisions_match_host(setup):
    w, ps, model = setup
    mesh_sc = MeshScorer.create(ps, model)
    host = HostScorer(ps, model)
    rows = np.arange(ps.n)
    for center in (0, ps.n // 2, ps.n - 1):
        b = np.full(ps.n, center)
        p_m, d_m = mesh_sc.score(rows, b)
        p_h, d_h = host.score(rows, b)
        np.testing.assert_array_equal(
            np.floor(p_m + 0.5), np.floor(p_h + 0.5)
        )
        assert int(np.argmax(d_m)) == int(np.argmax(d_h))


def test_full_clustering_through_mesh_scorer(setup, tmp_path):
    """End-to-end: MeanShiftEngine driven by the sharded scorer produces the
    same clusters as the host scorer."""
    w, ps, model = setup

    def clusters_with(scorer):
        eng = MeanShiftEngine(ps, model, w.id_cutoff, scorer=scorer)
        cls = eng.run()
        return sorted(
            (c.center_row, tuple(sorted(c.members)))
            for c in cls if not c.deleted
        )

    ref = clusters_with(HostScorer(ps, model))
    got = clusters_with(MeshScorer.create(ps, model))
    assert ref == got


def test_mesh_scorer_carries_bias(setup):
    """--bias must flow into the sharded epilogue: decisions with a nonzero
    bias match the host oracle (a missing + bias silently flips every
    borderline classification on the mesh path)."""
    w, ps, _ = setup
    model = CompiledModel(w.classifier, bias=0.3)

    def clusters_with(scorer):
        eng = MeanShiftEngine(ps, model, w.id_cutoff, scorer=scorer)
        return sorted(
            (c.center_row, tuple(sorted(c.members)))
            for c in eng.run() if not c.deleted
        )

    assert clusters_with(MeshScorer.create(ps, model)) == clusters_with(
        HostScorer(ps, model)
    )
