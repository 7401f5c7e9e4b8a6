"""fastcar --dump / --recover round trip (the weights.txt seam carries both
classification and regression blocks, mode 3)."""
import os

import numpy as np
import pytest

from meshclust2_tpu.fastcar import main
from meshclust2_tpu.model.weights import load_weights, PRED_MODE_CLASS, PRED_MODE_REGR


def _split_fixture(fixtures_dir, tmp):
    recs = []
    cur = None
    for line in open(os.path.join(fixtures_dir, "small.fasta")):
        line = line.rstrip("\n")
        if line.startswith(">"):
            cur = [line, []]
            recs.append(cur)
        elif line and cur:
            cur[1].append(line)
    db = tmp / "db.fasta"
    q = tmp / "q.fasta"
    with open(db, "w") as f:
        for h, s in recs[:150]:
            f.write(h + "\n" + "\n".join(s) + "\n")
    with open(q, "w") as f:
        for h, s in recs[150:160]:
            f.write(h + "\n" + "\n".join(s) + "\n")
    return db, q


def test_dump_then_recover(fixtures_dir, tmp_path):
    db, q = _split_fixture(fixtures_dir, tmp_path)
    w = tmp_path / "fc_weights.txt"
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = main([str(db), "-q", str(q), "--id", "0.9", "-m", "rc",
                   "--mut-type", "single", "--dump", str(w)])
        assert rc == 0
        model = load_weights(str(w))
        assert model.mode == (PRED_MODE_CLASS | PRED_MODE_REGR)
        assert model.classifier is not None and model.regressor is not None

        out1 = tmp_path / "o1.search"
        rc = main([str(db), "-q", str(q), "--recover", str(w), "-o", str(out1)])
        assert rc == 0
        lines1 = open(str(out1) + "0").read().splitlines()
        assert len(lines1) > 20

        # recover again: identical output (deterministic search)
        out2 = tmp_path / "o2.search"
        rc = main([str(db), "-q", str(q), "--recover", str(w), "-o", str(out2)])
        lines2 = open(str(out2) + "0").read().splitlines()
        assert lines1 == lines2
    finally:
        os.chdir(cwd)
