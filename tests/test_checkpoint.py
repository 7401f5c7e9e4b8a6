"""Clustering-phase checkpoint/resume: a resumed run must produce a
byte-identical CLSTR, and checkpoints must refuse a different dataset."""
import os

import numpy as np
import pytest

from meshclust2_tpu.cli import main


def _run(args):
    rc = main(args)
    assert rc == 0


def test_resume_from_accumulate_is_identical(fixtures_dir, tmp_path):
    w = os.path.join(fixtures_dir, "small_ref_weights.txt")
    f = os.path.join(fixtures_dir, "small.fasta")
    full = tmp_path / "full.clstr"
    ck = tmp_path / "state.npz"
    _run(["--recover", w, "--output", str(full), "--device", "host",
          "--checkpoint", str(ck), f])
    assert ck.exists()
    resumed = tmp_path / "resumed.clstr"
    _run(["--recover", w, "--output", str(resumed), "--device", "host",
          "--resume-cluster", str(ck), f])
    assert full.read_bytes() == resumed.read_bytes()


def test_mid_update_checkpoint_resumes_identically(fixtures_dir, tmp_path):
    from meshclust2_tpu.cli import load_sorted_points, make_scorer
    from meshclust2_tpu.cluster.engine import MeanShiftEngine
    from meshclust2_tpu.model.classifier import CompiledModel
    from meshclust2_tpu.model.weights import load_weights

    w = load_weights(os.path.join(fixtures_dir, "small_ref_weights.txt"))
    _, ps = load_sorted_points(
        [os.path.join(fixtures_dir, "small.fasta")], [], w.k, w.datatype, False
    )
    model = CompiledModel(w.classifier)

    def engine():
        return MeanShiftEngine(ps, model, w.id_cutoff,
                               scorer=make_scorer(ps, model, "host"))

    ck = str(tmp_path / "mid.npz")
    ref = engine().run(checkpoint=ck)
    # the LAST written checkpoint is after the final update iteration;
    # resuming from it must converge to the same clusters
    res = engine().run(resume=ck)
    key = lambda cls: sorted(
        (c.center_row, tuple(sorted(c.members))) for c in cls if not c.deleted
    )
    assert key(ref) == key(res)


def test_checkpoint_rejects_wrong_dataset(fixtures_dir, tmp_path):
    from meshclust2_tpu.cluster.checkpoint import load_checkpoint

    w = os.path.join(fixtures_dir, "small_ref_weights.txt")
    f = os.path.join(fixtures_dir, "small.fasta")
    ck = tmp_path / "state.npz"
    _run(["--recover", w, "--output", str(tmp_path / "o.clstr"),
          "--device", "host", "--checkpoint", str(ck), f])
    with pytest.raises(ValueError, match="different dataset"):
        load_checkpoint(str(ck), "not-the-right-fingerprint")
