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


def test_native_mid_phase_resume_every_iteration(fixtures_dir, tmp_path):
    """Resuming the native update driver at every intermediate iteration
    (nonzero start_it + prior cluster-count history) must reproduce the
    unbroken run's final clusters — the segment-skip flags start pessimistic
    on entry, so the miss stream downstream is identical."""
    from meshclust2_tpu.cli import load_sorted_points, make_scorer
    from meshclust2_tpu.cluster.bvec import BVec
    from meshclust2_tpu.cluster.engine import Cluster, MeanShiftEngine
    from meshclust2_tpu.model.classifier import CompiledModel
    from meshclust2_tpu.model.weights import load_weights
    from meshclust2_tpu.native import NativeScorer

    w = load_weights(os.path.join(fixtures_dir, "small_ref_weights.txt"))
    _, ps = load_sorted_points(
        [os.path.join(fixtures_dir, "small.fasta")], [], w.k, w.datatype, False
    )
    model = CompiledModel(w.classifier)
    scorer = make_scorer(ps, model, "host")
    if type(scorer) is not NativeScorer:
        pytest.skip("native scorer unavailable")
    eng = MeanShiftEngine(ps, model, w.id_cutoff, scorer=scorer)
    bv = BVec(ps.lengths, eng.bin_size)
    bv.insert_all(ps.lengths)
    bv.insert_finalize(ps.lengths)
    accumulated = eng.accumulate_all(bv)

    def as_clusters(centers, offsets, members):
        return [
            Cluster(center_row=int(centers[i]),
                    members=[int(m) for m in members[offsets[i]:offsets[i + 1]]])
            for i in range(len(centers))
        ]

    # unbroken run, capturing every iteration's state + count history
    snaps = []

    def capture(it, centers, offsets, members):
        snaps.append((it, centers.copy(), offsets.copy(), members.copy()))
        return 0

    full = scorer.update(accumulated, eng.sim, eng.delta, eng.iterations,
                         state_cb=capture)
    assert full is not None
    key = lambda res: sorted(
        (int(c), tuple(sorted(int(m) for m in res[2][res[1][i]:res[1][i + 1]])))
        for i, c in enumerate(res[0])
    )
    want = key(full)
    counts = [len(s[1]) for s in snaps]
    assert len(snaps) == full[3]  # one snapshot per executed iteration
    for idx, (it, centers, offsets, members) in enumerate(snaps):
        resumed = scorer.update(
            as_clusters(centers, offsets, members), eng.sim, eng.delta,
            eng.iterations, start_it=it, prior_counts=counts[:it],
        )
        assert resumed is not None
        assert key(resumed) == want, f"resume at iteration {it} diverged"
        # executed-iteration accounting must sum to the unbroken run's
        assert resumed[3] + it <= eng.iterations


def test_state_cb_abort_stops_iterations(fixtures_dir):
    from meshclust2_tpu.cli import load_sorted_points, make_scorer
    from meshclust2_tpu.cluster.bvec import BVec
    from meshclust2_tpu.cluster.engine import MeanShiftEngine
    from meshclust2_tpu.model.classifier import CompiledModel
    from meshclust2_tpu.model.weights import load_weights
    from meshclust2_tpu.native import NativeScorer

    w = load_weights(os.path.join(fixtures_dir, "small_ref_weights.txt"))
    _, ps = load_sorted_points(
        [os.path.join(fixtures_dir, "small.fasta")], [], w.k, w.datatype, False
    )
    model = CompiledModel(w.classifier)
    scorer = make_scorer(ps, model, "host")
    if type(scorer) is not NativeScorer:
        pytest.skip("native scorer unavailable")
    eng = MeanShiftEngine(ps, model, w.id_cutoff, scorer=scorer)
    bv = BVec(ps.lengths, eng.bin_size)
    bv.insert_all(ps.lengths)
    bv.insert_finalize(ps.lengths)
    res = scorer.update(eng.accumulate_all(bv), eng.sim, eng.delta,
                        eng.iterations, state_cb=lambda *a: 1)
    assert res is not None and res[3] == 1


def test_checkpoint_rejects_wrong_dataset(fixtures_dir, tmp_path):
    from meshclust2_tpu.cluster.checkpoint import load_checkpoint

    w = os.path.join(fixtures_dir, "small_ref_weights.txt")
    f = os.path.join(fixtures_dir, "small.fasta")
    ck = tmp_path / "state.npz"
    _run(["--recover", w, "--output", str(tmp_path / "o.clstr"),
          "--device", "host", "--checkpoint", str(ck), f])
    with pytest.raises(ValueError, match="different dataset"):
        load_checkpoint(str(ck), "not-the-right-fingerprint")
