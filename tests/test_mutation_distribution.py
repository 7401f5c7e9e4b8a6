"""Mutation-engine parity vs the reference binary.

The fixture TSVs were produced by driving the reference's HandleSeq through
the exact MMIX LCG chain our engine replicates (seed 12345; per sample:
random template of 800-1200bp, random rate 1-40, seeded HandleSeq, split =
randMod(rate)).  Identity estimates are computed BEFORE any
implementation-defined shuffle in both engines, so they must match the
reference EXACTLY per sample; output lengths are exact for single mode
(shuffles never change them) and near-exact for both mode (leftover-
insertion placement is shuffle-order dependent).
"""
import os

import numpy as np
import pytest

from meshclust2_tpu.mutate.engine import HandleSeq, MUT_SINGLE, MUT_BOTH
from meshclust2_tpu.utils.rng import LCG


def _generate(mode):
    rng = LCG(12345)

    def rseq(n):
        return "".join("ACGT"[rng.rand_mod(4)] for _ in range(n))

    out = []
    for _ in range(200):
        seq = rseq(800 + rng.rand_mod(400))
        rate = 1 + rng.rand_mod(40)
        hs = HandleSeq(mode, rng.next_rand_seed())
        spt = rng.rand_mod(rate)
        ident, mutated = hs.mutate(seq, rate, spt)
        out.append((rate, ident, len(mutated), len(seq)))
    return out


@pytest.mark.parametrize("mode,fixture", [
    (MUT_SINGLE, "mut_single.tsv"),
    (MUT_BOTH, "mut_both.tsv"),
])
def test_mutation_matches_reference(fixtures_dir, mode, fixture):
    ref = []
    for line in open(os.path.join(fixtures_dir, fixture)):
        rate, ident, out_len, in_len = line.split()
        ref.append((int(rate), float(ident), int(out_len), int(in_len)))
    ours = _generate(mode)
    assert len(ours) == len(ref)
    for i, ((rr, ri, rol, ril), (gr, gi, gol, gil)) in enumerate(zip(ref, ours)):
        assert gr == rr, f"sample {i}: rate diverged (LCG chain broken)"
        assert gil == ril, f"sample {i}: template length diverged"
        assert abs(gi - ri) < 1e-6, f"sample {i}: identity {gi} vs {ri}"
        assert gol == rol, f"sample {i}: output length {gol} vs {rol}"


def _fnv(s: str) -> int:
    h = 1469598103934665603
    for c in s.encode():
        h ^= c
        h = (h * 1099511628211) & ((1 << 64) - 1)
    return h


@pytest.mark.parametrize("mode,fixture", [
    (MUT_SINGLE, "mutseq_single.tsv"),
    (MUT_BOTH, "mutseq_both.tsv"),
])
def test_mutated_sequences_byte_exact(fixtures_dir, mode, fixture):
    """The engine produces byte-identical mutated sequences to the reference
    (FNV-1a hashes of 100 (template, rate, seed) samples per mode), covering
    the full LCG chain, 32-bit seed truncation, float32 percentage scaling,
    and the libstdc++ shuffle algorithm."""
    ref = [l.split() for l in open(os.path.join(fixtures_dir, fixture))]
    from meshclust2_tpu.utils.rng import LCG

    rng = LCG(98765)

    def rseq(n):
        return "".join("ACGT"[rng.rand_mod(4)] for _ in range(n))

    for i in range(100):
        seq = rseq(500 + rng.rand_mod(300))
        rate = 1 + rng.rand_mod(35)
        hs = HandleSeq(mode, rng.next_rand_seed())
        spt = rng.rand_mod(rate)
        _, mut = hs.mutate(seq, rate, spt)
        assert len(mut) == int(ref[i][1]), f"sample {i} length"
        assert _fnv(mut) == int(ref[i][2]), f"sample {i} content"
