"""Unit tests: FASTA parsing, encoding/segmentation, k-mer histograms vs
brute force, weights.txt round-trip against the reference-produced golden."""
import os

import numpy as np
import pytest

from meshclust2_tpu.io.fasta import (
    SequenceRecord,
    encode_sequence,
    read_fasta,
    acgt_only,
    codes_to_acgt,
)
from meshclust2_tpu.kmer.counting import (
    build_point_set,
    count_histogram,
    count_1mers,
    select_datatype,
    largest_pseudocount,
)
from meshclust2_tpu.model.weights import load_weights, save_weights


def brute_kmer_counts(seq: str, k: int):
    """Count k-mers the slow way over non-N maximal runs (assumes the
    sequence has no short segments or merges to worry about)."""
    d = 4**k
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    counts = np.ones(d, dtype=np.int64)
    run = []
    runs = []
    for c in seq:
        if c in code:
            run.append(code[c])
        else:
            if run:
                runs.append(run)
            run = []
    if run:
        runs.append(run)
    for r in runs:
        for i in range(len(r) - k + 1):
            v = 0
            for j in range(k):
                v = v * 4 + r[i + j]
            counts[v] += 1
    return counts


def test_encode_simple():
    rec = encode_sequence(">x", "ACGTACGTACGTACGTACGTACGT")
    assert rec.effective_size == 24
    assert rec.segments.tolist() == [[0, 23]]
    assert rec.codes[:4].tolist() == [0, 1, 2, 3]


def test_encode_iupac_quirks():
    # W->T, H->C, B->T, V->A, D->T, N->C (inside segments), X->G
    rec = encode_sequence(">x", "AWHBVDX" + "A" * 20)
    assert rec.codes[:7].tolist() == [0, 3, 1, 3, 0, 3, 2]


def test_segment_merge_and_drop():
    # 30 ACGT + 5 Ns (gap < 10 merges) + 30 ACGT  -> one segment, Ns -> C
    seq = "A" * 30 + "N" * 5 + "G" * 30
    rec = encode_sequence(">x", seq)
    assert rec.segments.tolist() == [[0, 64]]
    assert rec.effective_size == 65
    assert (rec.codes[30:35] == 1).all()  # N -> C inside merged segment
    # large gap separates; short segment (<20) dropped
    seq2 = "A" * 10 + "N" * 20 + "G" * 30
    rec2 = encode_sequence(">x", seq2)
    assert rec2.segments.tolist() == [[30, 59]]
    assert rec2.effective_size == 30


def test_last_position_quirk():
    # A run starting exactly at the final base is dropped (Chromosome.cpp:267-284)
    seq = "A" * 30 + "N" * 30 + "G"
    rec = encode_sequence(">x", seq)
    assert rec.segments.tolist() == [[0, 29]]


def test_kmer_counts_vs_brute(rng):
    for trial in range(5):
        n = int(rng.integers(50, 400))
        seq = "".join(rng.choice(list("ACGT"), n))
        rec = encode_sequence(">t", seq)
        for k in (1, 2, 3, 5):
            got = count_histogram(rec, k, None)
            want = brute_kmer_counts(seq, k)
            assert (got == want).all(), (trial, k)


def test_kmer_counts_with_n_runs(rng):
    seq = ("".join(rng.choice(list("ACGT"), 40)) + "N" * 25
           + "".join(rng.choice(list("ACGT"), 60)))
    rec = encode_sequence(">t", seq)
    got = count_histogram(rec, 3, None)
    want = brute_kmer_counts(seq, 3)
    assert (got == want).all()


def test_saturation():
    seq = "A" * 300  # AAAAA count 296 with k=5 -> pseudocount 297
    rec = encode_sequence(">t", seq)
    h = count_histogram(rec, 5, 255)
    assert h[0] == 255
    h2 = count_histogram(rec, 5, None)
    assert h2[0] == 297


def test_datatype_selection():
    assert select_datatype(255) == "uint8_t"
    assert select_datatype(256) == "uint16_t"
    assert select_datatype(70000) == "uint32_t"


def test_point_set_stats(rng):
    seq = "".join(rng.choice(list("ACGT"), 500))
    rec = encode_sequence(">t", seq)
    ps = build_point_set([rec], 4, "uint16_t")
    assert ps.counts.shape == (1, 256)
    assert ps.mags[0] == ps.counts[0].sum()
    assert ps.lengths[0] == 500
    # stddev matches Loader.cpp:162-171 formula
    m = ps.mags[0] / 256
    want = np.sqrt(((ps.counts[0] - m) ** 2).sum() / 256)
    assert abs(ps.stddevs[0] - want) < 1e-12
    om = count_1mers(rec)
    assert (ps.one_mers[0] == om).all()


def test_weights_roundtrip(fixtures_dir, tmp_path):
    path = os.path.join(fixtures_dir, "small_ref_weights.txt")
    model = load_weights(path)
    assert model.k == 5
    assert model.mode == 1
    assert model.datatype == "uint8_t"
    assert model.id_cutoff == 0.9
    blk = model.classifier
    assert len(blk.combos) == 4
    assert len(blk.singles) == 6
    out = tmp_path / "w.txt"
    save_weights(str(out), model)
    model2 = load_weights(str(out))
    assert model2.classifier.singles == blk.singles
    np.testing.assert_allclose(model2.classifier.weights, blk.weights, rtol=0, atol=0)
    np.testing.assert_allclose(model2.classifier.mins, blk.mins)
    np.testing.assert_allclose(model2.classifier.maxs, blk.maxs)


def test_fasta_read(fixtures_dir):
    recs = read_fasta(os.path.join(fixtures_dir, "small.fasta"))
    assert len(recs) == 200
    assert all(r.header.startswith(">seq") for r in recs)
    assert all(r.effective_size > 700 for r in recs)


def test_single_file_join():
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        f.write(">a\n" + "A" * 30 + "\n>b\n" + "G" * 30 + "\n")
        path = f.name
    recs = read_fasta(path, single_file=True)
    assert len(recs) == 1
    assert recs[0].total_size == 30 + 50 + 30
    # 50-N gap splits segments (gap >= 10)
    assert recs[0].segments.tolist() == [[0, 29], [80, 109]]
    os.unlink(path)


def test_acgt_utils():
    assert acgt_only("ACXGNT") == "ACGT"
    assert codes_to_acgt(np.array([0, 1, 2, 3])) == "ACGT"
