"""Fuzz the native fused scoring kernel (score_impl.h score_pairs — the
AVX-512 single-pass min/dot/EMD path with the AVX2/scalar fallbacks) against
the float64 host oracle on synthetic point sets.

Exercises the exactness-critical envelope: dims that hit the vector main
loop, the scalar tail (dim % 32 != 0), the dim > 8192 scalar EMD path, odd
batch sizes (the unpaired trailing element of the x2-interleaved loop), and
models with/without the EMD feature and with the log features that join the
fused pass."""
import numpy as np
import pytest

from meshclust2_tpu.cluster.engine import HostScorer
from meshclust2_tpu.features import flags as F
from meshclust2_tpu.kmer.counting import PointSet
from meshclust2_tpu.model.classifier import CompiledModel
from meshclust2_tpu.model.weights import ModelBlock
from meshclust2_tpu.native import NativeScorer


def _synthetic_ps(n, dim, seed, dtype=np.uint8, spread=12):
    rng = np.random.default_rng(seed)
    # cluster structure so some pairs land near the decision boundary
    base = rng.integers(1, spread, size=(8, dim))
    counts = np.empty((n, dim), dtype=np.int64)
    for i in range(n):
        tmpl = base[i % 8]
        noise = rng.integers(0, 3, size=dim) * (rng.random(dim) < 0.3)
        counts[i] = np.clip(tmpl + noise - 1, 1, np.iinfo(dtype).max)
    counts = counts.astype(dtype)
    mags = counts.sum(axis=1, dtype=np.int64)
    lengths = mags - dim + rng.integers(-5, 6, size=n)
    avg = mags / dim
    stddevs = np.sqrt(((counts.astype(np.float64) - avg[:, None]) ** 2).mean(axis=1))
    return PointSet(
        k=1,
        headers=[f">s{i}" for i in range(n)],
        counts=counts,
        one_mers=np.ones((n, 4), dtype=np.uint64),
        lengths=lengths.astype(np.int64),
        mags=mags,
        stddevs=stddevs,
        ids=np.arange(n, dtype=np.int64),
    )


def _model(singles, seed=3):
    rng = np.random.default_rng(seed)
    combos = [("x2y", (0, 1)), ("xy", (1, len(singles) - 1)),
              ("x2y2", (0, len(singles) - 1))]
    s = len(singles)
    block = ModelBlock(
        combos=[(k, F_or(singles, idxs)) for k, idxs in combos],
        weights=np.concatenate([[-0.5], rng.normal(0, 2.0, len(combos))]),
        singles=list(singles),
        mins=rng.uniform(0, 0.4, s),
        maxs=rng.uniform(60.0, 200.0, s),
    )
    return CompiledModel(block)


def F_or(singles, idxs):
    out = 0
    for i in idxs:
        out |= singles[i]
    return out


EMD_MODEL = [F.FEAT_INTERSECTION, F.FEAT_EMD, F.FEAT_KULCZYNSKI2]
NOEMD_MODEL = [F.FEAT_MANHATTAN, F.FEAT_NORMALIZED_VECTORS, F.FEAT_SIMRATIO]
LOG_MODEL = [F.FEAT_INTERSECTION, F.FEAT_EMD, F.FEAT_JEFFEREY_DIV,
             F.FEAT_JENSEN_SHANNON]


@pytest.mark.parametrize("dim", [64, 96, 256, 1024, 1056])
@pytest.mark.parametrize("singles", [EMD_MODEL, NOEMD_MODEL, LOG_MODEL],
                         ids=["emd", "noemd", "logs"])
def test_fused_kernel_matches_oracle(dim, singles):
    ps = _synthetic_ps(48, dim, seed=dim)
    model = _model(singles)
    native = NativeScorer.create(ps, model)
    if native is None:
        pytest.skip("native library unavailable")
    oracle = HostScorer(ps, model)
    rng = np.random.default_rng(dim + 1)
    for batch in (1, 2, 3, 47, 48):  # odd sizes hit the unpaired x2 tail
        a = rng.integers(0, ps.n, batch)
        b = rng.integers(0, ps.n, batch)
        pn, dn = native.score(a, b)
        po, do = oracle.score(a, b)
        # decisions must agree exactly; values to float64 round-off
        np.testing.assert_array_equal(np.floor(pn + 0.5) > 0,
                                      np.floor(po + 0.5) > 0)
        np.testing.assert_allclose(pn, po, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(dn, do, rtol=1e-9, atol=1e-12)


def test_fused_kernel_dim_over_8192():
    """dim > 8192 takes the scalar EMD path inside the AVX kernels."""
    ps = _synthetic_ps(12, 8256, seed=5, spread=4)
    model = _model(EMD_MODEL)
    native = NativeScorer.create(ps, model)
    if native is None:
        pytest.skip("native library unavailable")
    oracle = HostScorer(ps, model)
    a = np.arange(12)
    b = np.roll(a, 1)
    pn, dn = native.score(a, b)
    po, do = oracle.score(a, b)
    np.testing.assert_allclose(pn, po, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dn, do, rtol=1e-9, atol=1e-12)


def test_fused_kernel_broadcast_center():
    """b_stride=0 broadcast shape (the accumulate window form)."""
    ps = _synthetic_ps(64, 1024, seed=9)
    model = _model(EMD_MODEL)
    native = NativeScorer.create(ps, model)
    if native is None:
        pytest.skip("native library unavailable")
    oracle = HostScorer(ps, model)
    a = np.arange(63)
    pn, dn = native.score(a, np.array([63]))
    po, do = oracle.score(a, np.array([63]))
    np.testing.assert_allclose(pn, po, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dn, do, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("dtype", [np.uint16, np.uint32])
def test_fused_kernel_wide_dtypes(dtype):
    """u16/u32 histograms take the generic fused_stats path."""
    ps = _synthetic_ps(24, 256, seed=11, dtype=dtype, spread=300)
    model = _model(EMD_MODEL)
    native = NativeScorer.create(ps, model)
    if native is None:
        pytest.skip("native library unavailable")
    oracle = HostScorer(ps, model)
    rng = np.random.default_rng(1)
    a = rng.integers(0, ps.n, 33)
    b = rng.integers(0, ps.n, 33)
    pn, dn = native.score(a, b)
    po, do = oracle.score(a, b)
    np.testing.assert_allclose(pn, po, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dn, do, rtol=1e-9, atol=1e-12)
