"""Red (repeat detector) tests.

Region-coordinate parity is exact against the reference binary's .rpt/.scr
output on the fixture genome.  The reference's -msk output is NOT compared
byte-for-byte: its ChromListMaker::makeChromList preallocates the sequence
as spaces and appends the letters (Chromosome.cpp:18-25,88-97), so its
masked file carries a doubled buffer whose mask coordinates land in the
space padding — our masked output lowercases the actual repeat regions.
"""
import os

import numpy as np
import pytest

from meshclust2_tpu.red.cli import main
from meshclust2_tpu.red.table import EnrichmentTable
from meshclust2_tpu.red.scorer import ChromScores
from meshclust2_tpu.red.hmm import HMM
from meshclust2_tpu.io.fasta import read_fasta


def load_rpt(path):
    out = []
    for line in open(path):
        line = line.strip()
        if line:
            s, e = line.split(":")[-1].split("-")
            out.append((int(s), int(e)))
    return out


def load_scores(path):
    vals = []
    for line in open(path):
        line = line.strip()
        if line.startswith(">") or not line:
            continue
        vals.extend(int(x) for x in line.split())
    return vals


@pytest.fixture(scope="module")
def red_run(fixtures_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("red")
    out = tmp / "out"
    out.mkdir()
    rc = main([
        "-gnm", os.path.join(fixtures_dir, "red_genome"),
        "-len", "8",
        "-rpt", str(out), "-msk", str(out), "-sco", str(out),
    ])
    assert rc == 0
    return out


def test_red_scores_exact(red_run, fixtures_dir):
    ref = load_scores(os.path.join(fixtures_dir, "red_ref_chr1.scr"))
    got = load_scores(str(red_run / "chr1.scr"))
    assert got == ref


def test_red_regions_exact(red_run, fixtures_dir):
    ref = load_rpt(os.path.join(fixtures_dir, "red_ref_chr1.rpt"))
    got = load_rpt(str(red_run / "chr1.rpt"))
    assert got == ref


def test_red_mask_matches_regions(red_run, fixtures_dir):
    regions = load_rpt(str(red_run / "chr1.rpt"))
    lines = open(str(red_run / "chr1.msk")).read().split("\n")
    seq = "".join(l for l in lines if l and not l.startswith(">"))
    mask = np.zeros(len(seq), dtype=bool)
    for s, e in regions:
        mask[s:e] = True
    lower = np.frombuffer(seq.encode(), dtype=np.uint8) >= ord("a")
    assert (lower == mask).all()


def test_hmm_decode_simple():
    """Two-track decode recovers an obvious high/low score partition."""
    hmm = HMM(2.0, 8)
    scores = np.array([0] * 50 + [3] * 30 + [0] * 50)
    segs = [(0, 129)]
    cands = [(50, 79)]
    hmm.train(scores, segs, cands)
    hmm.normalize()
    regions = hmm.decode_segment(scores, 0, 129)
    assert regions == [(50, 79)]


def test_enrichment_table_zero_background():
    """Enriched k-mers score positive; unobserved k-mers score zero."""
    from meshclust2_tpu.io.fasta import encode_sequence

    rec = encode_sequence(">t", "ACGT" * 300)
    tbl = EnrichmentTable([rec], 4, 1, 3)
    # the dominant 4-mers of the repeat are heavily enriched
    assert tbl.max_value > 0
    assert (tbl.scores >= 0).all()
