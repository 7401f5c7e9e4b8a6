"""Sharded device histogram builder (parallel/mesh.sharded_histogram_build)
must be byte-equal to the native/host counter, including u8 saturation and
segment-mask semantics (VERDICT r2 weak item 4)."""
import os

import numpy as np
import pytest

from meshclust2_tpu.io.fasta import encode_sequence
from meshclust2_tpu.kmer.counting import (
    DTYPE_MAX,
    build_point_set,
    count_1mers,
    count_histogram,
)
from meshclust2_tpu.parallel.mesh import device_build_counts, make_mesh


def _device_vs_host(records, k, datatype):
    dtype_max = DTYPE_MAX[datatype]
    dev_c, dev_o = device_build_counts(records, k, dtype_max)
    for i, rec in enumerate(records):
        want_c = count_histogram(rec, k, dtype_max)
        want_o = count_1mers(rec)
        assert np.array_equal(dev_c[i].astype(np.uint64), want_c), i
        assert np.array_equal(dev_o[i].astype(np.uint64), want_o), i


def test_device_histograms_random_with_segments():
    rng = np.random.default_rng(21)
    bases = "ACGT"
    records = []
    for i in range(37):
        L = int(rng.integers(40, 900))
        s = list(rng.choice(list(bases), L))
        # salt with N runs to create segment structure (merges, drops)
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, L - 1))
            w = int(rng.integers(1, 40))
            for j in range(p, min(L, p + w)):
                s[j] = "N"
        records.append(encode_sequence(f"r{i}", "".join(s)))
    _device_vs_host(records, 4, "uint16_t")


def test_device_histograms_u8_saturation():
    # a long homopolymer run drives one k-mer count far past 255: the u8
    # path must saturate exactly like KmerHashTable.cpp:235-256
    rec = encode_sequence("sat", "A" * 2000 + "CGTACGT" * 30)
    _device_vs_host([rec], 5, "uint8_t")
    dtype_max = DTYPE_MAX["uint8_t"]
    dev_c, _ = device_build_counts([rec], 5, dtype_max)
    assert dev_c[0].max() == 255  # proves the saturating case was exercised


def test_device_histograms_med2000_match_native(fixtures_dir):
    from meshclust2_tpu.io.fasta import read_fasta

    records = read_fasta(os.path.join(fixtures_dir, "med2000.fasta"))[:300]
    _device_vs_host(records, 5, "uint8_t")


def test_build_point_set_device_count_env(fixtures_dir, monkeypatch):
    from meshclust2_tpu.io.fasta import read_fasta

    records = read_fasta(os.path.join(fixtures_dir, "small.fasta"))
    host_ps = build_point_set(records, 5, "uint8_t")
    monkeypatch.setenv("MC2_DEVICE_COUNT", "1")
    dev_ps = build_point_set(records, 5, "uint8_t")
    assert np.array_equal(host_ps.counts, dev_ps.counts)
    assert np.array_equal(host_ps.one_mers, dev_ps.one_mers)
    assert np.array_equal(host_ps.mags, dev_ps.mags)
    assert np.array_equal(host_ps.stddevs, dev_ps.stddevs)
