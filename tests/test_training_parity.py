"""Training-chain parity vs the reference binary (--threads 1 golden).

With the bit-exact mutation engine, Lemire-exact mt19937 distribution
mapping, reference-order native feature loops, and the replicated
Gauss-Jordan GLM chain, from-scratch training reproduces the reference's:
  - calibration outcome (15/30 probes -> 4 pos / 7 neg per template),
  - training/testing accuracies EXACTLY,
  - selected feature-pair set and combo kinds,
  - normalization bounds bitwise,
  - GLM weights to ~10 significant digits.

The residual weight ulps are compiler-codegen dependent: the reference's own
GLM produces different last bits under -O2 vs -O3 -march=native (and its
exact-equality singularity check can even branch differently), so bitwise
weight equality across independently compiled implementations is not a
meaningful target.
"""
import os

import numpy as np
import pytest

from meshclust2_tpu.features import flags as F
from meshclust2_tpu.model.weights import load_weights


@pytest.mark.slow
def test_training_reproduces_reference_selection(fixtures_dir, tmp_path):
    from meshclust2_tpu.cli import load_sorted_points
    from meshclust2_tpu.train.predictor import train_predictor

    tr, ps = load_sorted_points(
        [os.path.join(fixtures_dir, "small.fasta")], [], 5, "uint8_t", False,
        keep_seqs_train=True,
    )
    model = train_predictor(
        ps, k=5, identity=0.9, datatype="uint8_t",
        feat_flags=F.PRED_FEAT_FAST, mut_type=1, verbose=False,
    )
    ref = load_weights(os.path.join(fixtures_dir, "small_ref_weights.txt"))

    # identical selected feature set (combos and order)
    assert model.classifier.combos == ref.classifier.combos
    assert model.classifier.singles == ref.classifier.singles
    # normalization bounds identical at the file's 15-digit serialization
    # (the golden went through one %.15g round trip)
    fmt = lambda arr: [f"{v:.15g}" for v in arr]
    assert fmt(model.classifier.mins) == fmt(ref.classifier.mins)
    assert fmt(model.classifier.maxs) == fmt(ref.classifier.maxs)
    # weights to 9+ significant digits (ulp tail is codegen-dependent)
    np.testing.assert_allclose(
        model.classifier.weights, ref.classifier.weights, rtol=1e-9
    )


def test_mt19937_seed_chain_matches_reference():
    """The first Random::nextRandSeed values produced by the reference
    binary (instrumented run): Lemire downscale of raw mt19937(0xAA)."""
    from meshclust2_tpu.utils.rng import MTRandom

    r = MTRandom(0xAA)
    got = [r.next_rand_seed() for _ in range(5)]
    assert got == [226110361, 1458518054, 974363939, 122648075, 1161919659]
