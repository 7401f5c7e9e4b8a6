"""Inventory-completeness components: LCS length, protein encoding,
Markov-random chromosome, raw histogram (SURVEY §2.2/2.4/2.5 rows that no
shipped reference binary reaches)."""
import re
import numpy as np
import pytest

from meshclust2_tpu.io.fasta import encode_protein_sequence
from meshclust2_tpu.kmer.histogram import RawHistogram
from meshclust2_tpu.red.random_chrom import markov_random_chromosome
from meshclust2_tpu.utils.lcs import lcs_length


def _lcs_brute(a: str, b: str) -> int:
    m, n = len(a), len(b)
    t = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if a[i - 1] == b[j - 1]:
                t[i][j] = t[i - 1][j - 1] + 1
            else:
                t[i][j] = max(t[i - 1][j], t[i][j - 1])
    return t[m][n]


def test_lcs_matches_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = "".join(rng.choice(list("ACGT"), rng.integers(1, 40)))
        b = "".join(rng.choice(list("ACGT"), rng.integers(1, 40)))
        assert lcs_length(a, b) == _lcs_brute(a, b)
    assert lcs_length("ACGT", "ACGT") == 4
    assert lcs_length("AAAA", "TTTT") == 0
    # inclusive-window convention
    assert lcs_length("XACGTX", "ACGT", start1=1, end1=4) == 4
    with pytest.raises(ValueError):
        lcs_length("ACGT", "ACGT", start1=3, end1=1)


def test_protein_encoding_codes():
    rec = encode_protein_sequence(">p", "ACDEFGHIKLMNOPQRSTUVWY")
    assert list(rec.codes) == list(range(22))
    # ambiguity fallbacks B->D, Z->E, J->L (ChromosomeOneDigitProtein.cpp:58-61)
    rec = encode_protein_sequence(">p", "BZJ")
    assert list(rec.codes) == [2, 3, 9]
    rec = encode_protein_sequence(">p", "mkv")  # case-insensitive
    assert list(rec.codes) == [10, 8, 19]
    with pytest.raises(ValueError):
        encode_protein_sequence(">p", "AC*G")


def test_markov_random_chromosome_structure():
    rng = np.random.default_rng(1)
    base = "".join(rng.choice(list("ACGT"), 400))
    base = base[:100] + "N" * 10 + base[110:]
    segments = [(0, 99), (110, 399)]
    out = markov_random_chromosome(base, segments, order=1, seed=7)
    assert len(out) == len(base)
    assert out[100:110] == "N" * 10                  # unread gap preserved
    assert set(out[:100]) <= set("ACGT")
    assert out[0] == base[0]                          # order-1: first char copied
    assert out != base                                # actually randomized


def test_markov_random_short_segment_stays_unread():
    # segments with length <= order+1 are not generated (strict >)
    out = markov_random_chromosome("ACGTACGT", [(0, 2)], order=2, seed=0)
    assert out == "NNNNNNNN"


def test_markov_order0_frequencies():
    # order 0: output base frequencies track the input's (GC-rich input)
    rng = np.random.default_rng(2)
    base = "".join(rng.choice(list("ACGT"), 5000, p=[0.1, 0.4, 0.4, 0.1]))
    out = markov_random_chromosome(base, [(0, len(base) - 1)], order=0, seed=3)
    gc = (out.count("G") + out.count("C")) / len(out)
    assert 0.7 < gc < 0.9


def test_raw_histogram_ops():
    h = RawHistogram([1, 2, 3, 4], dtype=np.uint16)
    g = RawHistogram([4, 3, 2, 1], dtype=np.uint16)
    assert h.magnitude() == 10
    assert h.distance(g) == 3 + 1 + 1 + 3
    assert not h.strictly_less(g)
    assert RawHistogram([0, 1, 0, 0], dtype=np.uint16).strictly_less(g)
    h.add(g)
    assert list(h.points) == [5, 5, 5, 5]
    h.scale(0.5)
    assert list(h.points) == [2, 2, 2, 2]   # truncating integer semantics
    h.add_one().sub_one()
    assert list(h.points) == [2, 2, 2, 2]
    z = RawHistogram(4)
    assert z.magnitude() == 0 and len(z.points) == 4


def test_progress_bar_rendering(capsys, monkeypatch):
    # Progress rendering matches the reference (Progress.cpp:23-44):
    # "prefix [===>  ] NN %\r" with barWidth = 70 - (len(prefix)+1),
    # redrawn only on integer-percent changes, end() completes + newline.
    from meshclust2_tpu.utils import progress as P

    monkeypatch.setattr(P, "_enabled", lambda: True)
    p = P.Progress(4, "Update")
    p.step()
    p.step(2)
    p.end()
    p.end()  # idempotent
    out = capsys.readouterr().out
    frames = [f for f in out.split("\r") if f]
    width = 70 - (len("Update") + 1)
    assert frames[0].startswith("Update [")
    assert frames[0].endswith(" 0 %")
    assert frames[1].endswith(" 25 %")
    assert frames[2].endswith(" 75 %")
    assert frames[3].endswith(" 100 %")
    assert out.endswith("\n")
    bar0 = frames[0][len("Update ["):frames[0].index("]")]
    assert len(bar0) == width and bar0[0] == ">"
    bar_full = frames[3][len("Update ["):frames[3].index("]")]
    assert bar_full == "=" * width
    # same-percent redraws are deduped
    p2 = P.Progress(1000, "Accumulation")
    p2.step()  # 0 % again -> no redraw
    out2 = capsys.readouterr().out
    assert out2.count("\r") == 1


def test_progress_disabled_when_not_tty(capsys):
    from meshclust2_tpu.utils.progress import Progress

    p = Progress(10, "Silent")
    p.step(5)
    p.end()
    assert capsys.readouterr().out == ""


def test_fastcar_mem_used_format(capsys):
    from meshclust2_tpu.fastcar import mem_used

    mem_used("before loop")
    out = capsys.readouterr().out
    assert re.match(r"^before loop: used memory: \d+ KB$", out.strip())
