"""Device-built training pair tables (train/device_tables.py) vs the host
oracle build: the P4 feature-matrix kernel must reproduce the golden-config
training outcome — identical selected feature sets, bit-identical serialized
normalization bounds, and weights to well past the documented ~10-digit
compiler-ulp envelope (IMPLEMENTATION.md, intentional divergence #1)."""
import os

import numpy as np
import pytest

from meshclust2_tpu.cli import main
from meshclust2_tpu.model.weights import load_weights


def _train_dump(fixtures_dir, tmp, name, env):
    w = tmp / name
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rc = main([
            "--id", "0.9", "--kmer", "5", "--mut-type", "single",
            "--dump", str(w), "--device", "host",
            os.path.join(fixtures_dir, "small.fasta"),
        ])
    finally:
        os.chdir(cwd)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert rc == 0
    return load_weights(str(w)), open(w).read()


@pytest.mark.slow
def test_device_pair_tables_match_host_training(fixtures_dir, tmp_path):
    host_model, host_txt = _train_dump(fixtures_dir, tmp_path, "host_w.txt",
                                       env={})
    dev_model, dev_txt = _train_dump(fixtures_dir, tmp_path, "dev_w.txt",
                                     env={"MC2_DEVICE_TRAIN": "1"})
    hb, db = host_model.classifier, dev_model.classifier
    # identical feature-set selection
    assert hb.combos == db.combos
    assert hb.singles == db.singles
    # bit-identical serialized normalization bounds (the exact-extrema
    # recheck contract of device_raw_singles)
    assert np.array_equal(np.asarray(hb.mins), np.asarray(db.mins))
    assert np.array_equal(np.asarray(hb.maxs), np.asarray(db.maxs))
    # weights agree to ~1e-9 relative (table entries differ at the dd error
    # level ~1e-13; the solves amplify only modestly)
    hw = np.asarray(hb.weights)
    dw = np.asarray(db.weights)
    assert np.allclose(hw, dw, rtol=1e-7, atol=1e-9), (hw, dw)


def test_device_raw_singles_exact_bounds(fixtures_dir):
    """Unit-level: device raw tables carry exact per-single extrema and
    stay within the dd error envelope of the float64 oracle."""
    from meshclust2_tpu.features import flags as F
    from meshclust2_tpu.features import host as H
    from meshclust2_tpu.io.fasta import read_fasta
    from meshclust2_tpu.kmer.counting import build_point_set
    from meshclust2_tpu.train.device_tables import device_raw_singles

    recs = read_fasta(os.path.join(fixtures_dir, "small.fasta"))
    ps = build_point_set(recs, 5, "uint8_t")
    rng = np.random.default_rng(3)
    a = rng.integers(0, ps.n, 500).astype(np.int64)
    b = rng.integers(0, ps.n, 500).astype(np.int64)
    singles = F.split_flags(F.PRED_FEAT_FAST)

    def host_exact(idx):
        A = H.side_from_pointset(ps, a[idx])
        B = H.side_from_pointset(ps, b[idx])
        return H.compute_singles(singles, A, B)

    got = device_raw_singles(ps, a, b, singles, host_exact)
    assert got is not None
    want = host_exact(np.arange(len(a)))
    # bit-exact extrema per single
    assert np.array_equal(got.min(axis=0), want.min(axis=0))
    assert np.array_equal(got.max(axis=0), want.max(axis=0))

    # error-bound SOUNDNESS (what the exact-extrema recheck relies on):
    # every deviation from the oracle must sit inside the kernel's own
    # 8*err window (random pairs include identical rows, whose cancelling
    # z-features legitimately reach ~1e-7 relative)
    from meshclust2_tpu.train.device_tables import DeviceTableBuilder

    raw, err = DeviceTableBuilder(ps, singles).raw_with_err(a, b)
    assert np.all(np.abs(raw - want) <=
                  8 * err + 1e-12 * np.maximum(np.abs(want), 1.0))


def _fastcar_train_dump(fixtures_dir, tmp, name, env):
    """Train a CLASS+REGR model through fastcar's --dump path."""
    from meshclust2_tpu.fastcar import main as fc_main

    w = tmp / name
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rc = fc_main([
            "--mode", "rc", "--id", "0.8", "--kmer", "5",
            "--mut-type", "single", "--sample", "30",
            "--dump", str(w),
            "--query", os.path.join(fixtures_dir, "small.fasta"),
            os.path.join(fixtures_dir, "small.fasta"),
        ])
    finally:
        os.chdir(cwd)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert rc == 0
    return load_weights(str(w))


@pytest.mark.slow
def test_device_tables_regression_mode(fixtures_dir, tmp_path):
    """VERDICT r3 #5: regression-mode training through device tables — the
    RNG-consuming row rebalance replays onto the exact re-solve, so the
    regressor block matches the host build (selection identical, weights
    from the same float64 solve)."""
    host = _fastcar_train_dump(fixtures_dir, tmp_path, "h.txt", env={})
    dev = _fastcar_train_dump(fixtures_dir, tmp_path, "d.txt",
                              env={"MC2_DEVICE_TRAIN": "1"})
    for attr in ("classifier", "regressor"):
        hb = getattr(host, attr)
        db = getattr(dev, attr)
        assert hb is not None and db is not None
        assert hb.combos == db.combos, attr
        assert hb.singles == db.singles, attr
        assert np.array_equal(np.asarray(hb.mins), np.asarray(db.mins))
        assert np.array_equal(np.asarray(hb.maxs), np.asarray(db.maxs))
        hw, dw = np.asarray(hb.weights), np.asarray(db.weights)
        assert np.allclose(hw, dw, rtol=1e-7, atol=1e-9), (attr, hw, dw)
    # the regression weights come from the SAME float64 solve both ways
    assert np.array_equal(np.asarray(host.regressor.weights),
                          np.asarray(dev.regressor.weights))
