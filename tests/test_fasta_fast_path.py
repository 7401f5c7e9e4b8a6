"""The vectorized FASTA fast path (io/fasta._read_fasta_fast) must produce
records byte-identical to the per-line parser + encoder chain on every
input it accepts, and decline inputs that need the per-line path."""
import numpy as np
import pytest

from meshclust2_tpu.io import fasta as F


def _slow(path):
    recs = list(F.iter_fasta(path))
    return F.encode_records(recs) if recs else []


CASES = {
    "plain": b">a h1\nACGT\nGGTT\n>b\nTTTT\n",
    "no_trailing_newline": b">a\nACGT\n>b\nTT",
    "crlf": b">a x\r\nACGT\r\nGG\r\n>b\r\nTTNNA\r\n",
    "empty_record": b">a\n>b\nACGT\n>c\n",
    "pre_header_junk": b"junk\nmore\n>a\nACGT\n",
    "iupac": b">a\nACGRYSWKMBDHVNX\nACGT\n",
    "lowercase": b">a\nacgtn\n",
    "n_runs": b">a\n" + b"ACGT" * 30 + b"N" * 5 + b"ACGT" * 30 + b"\n",
    "header_only": b">a",
}

FALLBACK_CASES = {
    "space_line_start": b">a\nACGT\n  GG\n>b\nTT\n",
    "bare_cr": b">a\rACGT\n",
    "empty": b"",
    "non_ascii": b">a \xc3\xa9\nACGT\n",
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_fast_path_matches_slow(tmp_path, name):
    p = tmp_path / f"{name}.fa"
    p.write_bytes(CASES[name])
    fast = F._read_fasta_fast(str(p))
    if fast is None:
        pytest.skip("native encoder unavailable")
    ref = _slow(str(p))
    assert len(fast) == len(ref)
    for a, b in zip(fast, ref):
        assert a.header == b.header
        assert np.array_equal(a.codes, b.codes)
        assert np.array_equal(a.segments, b.segments)
        assert a.effective_size == b.effective_size
        assert a.total_size == b.total_size
        assert a.ref_list_effective_size == b.ref_list_effective_size
        assert a.gc_count == b.gc_count


@pytest.mark.parametrize("name", sorted(FALLBACK_CASES))
def test_fast_path_declines(tmp_path, name):
    p = tmp_path / f"{name}.fa"
    p.write_bytes(FALLBACK_CASES[name])
    assert F._read_fasta_fast(str(p)) is None


def test_read_fasta_uses_identical_records(tmp_path, fixtures_dir):
    import os

    src = os.path.join(fixtures_dir, "med2000.fasta")
    fast = F.read_fasta(src, False)
    slow = _slow(src)
    assert len(fast) == len(slow) == 2000
    for a, b in zip(fast, slow):
        assert a.header == b.header
        assert np.array_equal(a.codes, b.codes)
        assert a.effective_size == b.effective_size
