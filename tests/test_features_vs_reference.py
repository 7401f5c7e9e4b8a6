"""Feature oracle parity vs reference-generated fixtures.

tests/fixtures/feats_k{2,4}.tsv hold raw single-feature values computed by the
upstream C++ implementation (via a probe binary linked against it) for the
sequence pairs in tests/fixtures/pairs.fasta.  Our float64 oracle must match
to tight relative tolerance (summation-order differences only).
"""
import os

import numpy as np
import pytest

from meshclust2_tpu.features import flags as F
from meshclust2_tpu.features import host as H
from meshclust2_tpu.io.fasta import read_fasta
from meshclust2_tpu.kmer.counting import build_point_set

# features whose formulas involve transcendentals accumulate slightly more
# summation-order error
LOOSE = {
    F.FEAT_MARKOV, F.FEAT_SIM_MM, F.FEAT_KL_COND, F.FEAT_RRE_K_R,
    F.FEAT_JENSEN_SHANNON, F.FEAT_JEFFEREY_DIV, F.FEAT_K_DIV,
    F.FEAT_D2s, F.FEAT_D2_star, F.FEAT_AFD,
}


@pytest.mark.parametrize("k", [2, 4])
def test_all_singles_match_reference(fixtures_dir, k):
    recs = read_fasta(os.path.join(fixtures_dir, "pairs.fasta"))
    ps = build_point_set(recs, k, "uint16_t")
    rows = []
    with open(os.path.join(fixtures_dir, f"feats_k{k}.tsv")) as f:
        for line in f:
            a, b, lg, v = line.split()
            rows.append((int(a), int(b), int(lg), float(v)))
    # group by feature
    by_feat = {}
    for a, b, lg, v in rows:
        by_feat.setdefault(lg, []).append((a, b, v))
    for lg, entries in sorted(by_feat.items()):
        # The reference's Feature::log2 scans bits 0..32 only
        # (Feature.h:246-253), so FEAT_N2RRC (bit 33) reports as 0.
        flag = F.FEAT_N2RRC if lg == 0 else (1 << lg)
        a_idx = np.array([e[0] for e in entries])
        b_idx = np.array([e[1] for e in entries])
        want = np.array([e[2] for e in entries])
        A = H.side_from_pointset(ps, a_idx)
        B = H.side_from_pointset(ps, b_idx)
        got = H.compute_singles([flag], A, B)[:, 0]
        rtol = 1e-9 if flag in LOOSE else 1e-12
        np.testing.assert_allclose(
            got, want, rtol=rtol, atol=1e-12,
            err_msg=f"feature {F.FEAT_NAMES[flag]} (k={k})",
        )
