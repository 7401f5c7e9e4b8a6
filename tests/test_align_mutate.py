"""Global aligner parity vs reference fixture + mutation-engine identity
accounting sanity."""
import os

import numpy as np
import pytest

from meshclust2_tpu.utils.align import global_align_identity
from meshclust2_tpu.mutate.engine import HandleSeq, MUT_SINGLE, MUT_BOTH
from meshclust2_tpu.utils.rng import LCG


def test_align_vs_reference(fixtures_dir):
    with open(os.path.join(fixtures_dir, "align_golden.tsv")) as f:
        for line in f:
            a, b, score, length, ident = line.rstrip("\n").split("\t")
            s, l, m, i = global_align_identity(a, b)
            assert s == int(score), (a[:20], s, score)
            assert l == int(length), (a[:20], l, length)
            assert abs(i - float(ident)) < 1e-12


def test_mutation_identity_tracks_alignment():
    """The mutation engine's closed-form identity estimate should correlate
    tightly with true alignment identity (it is the label generator for GLM
    training, HandleSeq.cpp:124-128)."""
    rng = LCG(1234)

    def rseq(n):
        return "".join("ACGT"[rng.rand_mod(4)] for _ in range(n))

    errs = []
    for mut_type in (MUT_SINGLE, MUT_BOTH):
        for rate in (3, 10, 25):
            seq = rseq(600)
            h = HandleSeq(mut_type, rng.next_rand_seed())
            spt = rng.rand_mod(rate)
            est, mutated = h.mutate(seq, rate, spt)
            assert len(mutated) > 0
            _, _, _, true_id = global_align_identity(seq, mutated)
            errs.append(abs(est - true_id))
    assert np.mean(errs) < 0.06, errs


def test_mutation_rate_monotonic():
    rng = LCG(99)
    seq = "".join("ACGT"[rng.rand_mod(4)] for _ in range(800))
    ids = []
    for rate in (2, 8, 20, 40):
        h = HandleSeq(MUT_SINGLE, 42)
        est, _ = h.mutate(seq, rate, 0)
        ids.append(est)
    assert all(ids[i] > ids[i + 1] for i in range(len(ids) - 1))


def test_mutation_zero_rate_identity():
    h = HandleSeq(MUT_BOTH, 7)
    est, out = h.mutate("ACGTACGT" * 10, 0, 0)
    assert est == 1.0
    assert out == "ACGTACGT" * 10
