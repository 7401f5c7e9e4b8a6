"""Sharded compute tests on the 8-device virtual CPU mesh: results must be
invariant to the mesh (SURVEY §4.4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from meshclust2_tpu.parallel import mesh as M


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return M.make_mesh(8)


def _shard(mesh, arr, spec):
    return jax.device_put(arr, NamedSharding(mesh, spec))


def test_sharded_histogram_matches_host(mesh8):
    from meshclust2_tpu.io.fasta import SequenceRecord
    from meshclust2_tpu.kmer.counting import count_1mers, count_histogram

    k = 3
    rng = np.random.default_rng(0)
    n, L = 16, 64
    codes = rng.integers(0, 4, size=(n, L)).astype(np.int8)
    codes[:, -3:] = -1
    codes[3, 10] = -1  # a segment break mid-row
    fn = M.sharded_histogram_build(mesh8, k, dtype_max=255)
    got_c, got_o = fn(_shard(mesh8, codes.astype(np.int8), P("data")))
    got_c, got_o = np.asarray(got_c), np.asarray(got_o)
    for i in range(n):
        arr = codes[i]
        # segments = maximal runs of valid codes
        valid = arr >= 0
        edges = np.diff(np.concatenate([[0], valid.view(np.int8), [0]]))
        starts = np.nonzero(edges == 1)[0]
        ends = np.nonzero(edges == -1)[0] - 1
        segs = np.stack([starts, ends], axis=1)
        rec = SequenceRecord(">x", arr, segs, int(valid.sum()), L)
        np.testing.assert_array_equal(got_c[i], count_histogram(rec, k, 255))
        np.testing.assert_array_equal(got_o[i], count_1mers(rec))


def test_sharded_glm_matches_numpy(mesh8):
    from meshclust2_tpu import glm as G

    rng = np.random.default_rng(1)
    X = np.concatenate(
        [np.ones((64, 1), np.float32), rng.standard_normal((64, 3)).astype(np.float32)],
        axis=1,
    )
    y = (X @ np.array([1.0, -0.5, 2.0, 0.1], np.float32)
         + 0.01 * rng.standard_normal(64).astype(np.float32))
    fn = M.sharded_glm_solve(mesh8)
    w = np.asarray(fn(_shard(mesh8, X, P("data")), _shard(mesh8, y, P("data"))))
    want = G.train_glm(X.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(w, want, atol=1e-3)


def test_sharded_mean_update_matches_host(mesh8):
    from meshclust2_tpu.cluster.engine import distance_d

    rng = np.random.default_rng(2)
    n, d, C = 32, 64, 3
    H = rng.integers(1, 20, size=(n, d)).astype(np.float32)
    mags = H.sum(axis=1)
    mask = (rng.random((C, n)) < 0.4).astype(np.float32)
    mask[:, 0] = 1.0
    rows = np.arange(n, dtype=np.int32)
    fn = M.sharded_mean_update(mesh8)
    gmin, garg = fn(
        _shard(mesh8, H, P("data")),
        _shard(mesh8, mags, P("data")),
        _shard(mesh8, mask, P(None, "data")),
        _shard(mesh8, rows, P("data")),
    )
    gmin, garg = np.asarray(gmin), np.asarray(garg)
    for c in range(C):
        members = np.nonzero(mask[c] > 0)[0]
        top = H[members].mean(axis=0).astype(np.float64)
        dvals = distance_d(H[members].astype(np.uint32), top)
        want_min = dvals.min()
        np.testing.assert_allclose(gmin[c], want_min, rtol=1e-5)


def test_mesh_shape_invariance_scores_and_update():
    """sharded_center_scores and sharded_mean_update on 1, 2, 4, 8 devices
    produce identical results (SCALING.md's mesh-size invariance claim)."""
    rng = np.random.default_rng(7)
    n, d, C = 32, 64, 3
    H = rng.integers(1, 20, size=(n, d)).astype(np.float32)
    mags = H.sum(axis=1)
    mask = (rng.random((C, n)) < 0.4).astype(np.float32)
    mask[:, 0] = 1.0
    rows = np.arange(n, dtype=np.int32)
    center = H[0].copy()

    def singles_fn(H_local, c):
        s_min = jnp.minimum(H_local, c[None, :]).sum(axis=1)
        s_abs = jnp.abs(H_local - c[None, :]).sum(axis=1)
        inter = 2 * s_min / (H_local.sum(axis=1) + c.sum())
        return jnp.stack([s_abs, inter], axis=1)

    epilogue = M.classify_kernel_factory(
        weights=np.array([-1.0, 1.5, 2.5]),
        mins=np.array([0.0, 0.0]),
        maxs=np.array([float(2 * d * 20), 1.0]),
        is_sim=np.array([False, True]),
        combo_spec=(("xy", (0, 1)), ("x2y2", (0, 1))),
    )
    score_res, upd_res = [], []
    for nd in (1, 2, 4, 8):
        mesh = M.make_mesh(nd)
        sfn = M.sharded_center_scores(mesh, singles_fn, epilogue)
        prob, dist = sfn(_shard(mesh, H, P("data")), jnp.asarray(center))
        score_res.append((np.asarray(prob), np.asarray(dist)))
        ufn = M.sharded_mean_update(mesh)
        gmin, garg = ufn(
            _shard(mesh, H, P("data")),
            _shard(mesh, mags, P("data")),
            _shard(mesh, mask, P(None, "data")),
            _shard(mesh, rows, P("data")),
        )
        upd_res.append((np.asarray(gmin), np.asarray(garg)))
    for i in (1, 2, 3):
        np.testing.assert_array_equal(score_res[0][0], score_res[i][0])
        np.testing.assert_array_equal(score_res[0][1], score_res[i][1])
        np.testing.assert_allclose(upd_res[0][0], upd_res[i][0], rtol=1e-6)
        np.testing.assert_array_equal(upd_res[0][1], upd_res[i][1])


def test_mesh_shape_invariance():
    """Same sharded GLM solve on 2, 4, 8 devices gives the same weights."""
    rng = np.random.default_rng(3)
    X = np.concatenate(
        [np.ones((64, 1), np.float32), rng.standard_normal((64, 2)).astype(np.float32)],
        axis=1,
    )
    y = (X @ np.array([0.3, 1.2, -0.7], np.float32)).astype(np.float32)
    results = []
    for nd in (2, 4, 8):
        mesh = M.make_mesh(nd)
        fn = M.sharded_glm_solve(mesh)
        w = np.asarray(fn(_shard(mesh, X, P("data")), _shard(mesh, y, P("data"))))
        results.append(w)
    np.testing.assert_allclose(results[0], results[1], rtol=1e-5)
    np.testing.assert_allclose(results[0], results[2], rtol=1e-5)
