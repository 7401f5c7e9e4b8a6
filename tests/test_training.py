"""Training-pipeline tests: from-scratch training must reach reference-level
classifier accuracy and produce clusterings of equivalent quality (exact
training parity is impossible across RNG implementations; SURVEY §4.3
anchors exact parity on --recover, statistical parity here)."""
import os

import numpy as np
import pytest

from meshclust2_tpu.cli import main
from meshclust2_tpu.io.clstr import parse_clstr
from meshclust2_tpu.io.fasta import read_fasta
from meshclust2_tpu.kmer.counting import build_point_set
from meshclust2_tpu.model.weights import load_weights


@pytest.fixture(scope="module")
def trained(fixtures_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    out = tmp / "out.clstr"
    w = tmp / "w.txt"
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rc = main(
            [
                "--id", "0.9", "--kmer", "5", "--mut-type", "single",
                "--output", str(out), "--device", "host",
                os.path.join(fixtures_dir, "small.fasta"),
            ]
        )
    finally:
        os.chdir(cwd)
    assert rc == 0
    return tmp, out


def test_trained_cluster_quality(trained, fixtures_dir):
    tmp, out = trained
    got = parse_clstr(str(out))
    ref = parse_clstr(os.path.join(fixtures_dir, "small_ref.clstr"))
    # same number of clusters (one per template) and perfect template purity
    assert len(got) == len(ref) == 20
    for c in got:
        templates = {m["header"].split("template_")[1] for m in c}
        assert len(templates) == 1
    sizes = sorted(len(c) for c in got)
    assert sizes == [10] * 20


def test_trained_weights_file(trained):
    tmp, _ = trained
    model = load_weights(str(tmp / "weights.txt"))
    assert model.k == 5
    assert model.mode == 1
    blk = model.classifier
    assert 1 <= len(blk.combos) <= 4
    assert np.isfinite(blk.weights).all()
    assert (blk.maxs > blk.mins).all()


def test_dump_then_recover(trained, fixtures_dir, tmp_path):
    """--dump / --recover round trip through our own weights."""
    tmp, ref_out = trained
    out2 = tmp_path / "out2.clstr"
    rc = main(
        [
            "--recover", str(tmp / "weights.txt"),
            "--output", str(out2), "--device", "host",
            os.path.join(fixtures_dir, "small.fasta"),
        ]
    )
    assert rc == 0
    a = parse_clstr(str(ref_out))
    b = parse_clstr(str(out2))
    sig = lambda cl: sorted(frozenset(m["header"] for m in c) for c in cl)
    assert sig(a) == sig(b)


def test_cxx_max_heap_matches_libstdcxx_traces():
    # CxxMaxHeap must replicate libstdc++ std::priority_queue pop order
    # exactly (accuracy-only comparator -> tie order is pure heap mechanics).
    # Fixture: 40 random push/pop traces recorded from a compiled
    # std::priority_queue<pair<int,double>, vector, Compare{.second<}>.
    import json
    import os

    from meshclust2_tpu.train.selectors import CxxMaxHeap

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "cxx_heap_traces.json")
    traces = json.load(open(path))
    assert len(traces) == 40
    for t in traces:
        h = CxxMaxHeap()
        pid = 0
        got = []
        for op, acc in t["ops"]:
            if op == 1:
                h.push(acc, pid)
                pid += 1
            elif len(h):
                got.append(h.pop()[1])
        assert got == t["pops"]
