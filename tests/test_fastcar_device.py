"""fastcar device path (MC2_FASTCAR_DEVICE=1): the dd-f32 batched search
must produce byte-identical output.search files to the host path
(FC_Runner.cpp:426-471 semantics, printed-value recheck discipline)."""
import os

import pytest

from meshclust2_tpu.fastcar import main


@pytest.fixture(scope="module")
def fc_weights(fixtures_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fcdev")
    recs = []
    cur = None
    for line in open(os.path.join(fixtures_dir, "med2000.fasta")):
        line = line.rstrip("\n")
        if line.startswith(">"):
            cur = [line, []]
            recs.append(cur)
        elif line and cur:
            cur[1].append(line)
    db = tmp / "db.fasta"
    q = tmp / "q.fasta"
    with open(db, "w") as f:
        for h, s in recs[:250]:
            f.write(h + "\n" + "\n".join(s) + "\n")
    with open(q, "w") as f:
        for h, s in recs[250:280]:
            f.write(h + "\n" + "\n".join(s) + "\n")
    weights = tmp / "fc_weights.txt"
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rc = main([str(db), "-q", str(q), "--id", "0.9", "-m", "rc",
                   "--mut-type", "single", "--dump", str(weights),
                   "-o", str(tmp / "ignored.search")])
    finally:
        os.chdir(cwd)
    assert rc == 0
    return tmp, db, q, weights


def _run(tmp, db, q, weights, name, env=None):
    out = tmp / name
    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rc = main([str(db), "-q", str(q), "--id", "0.9", "-m", "rc",
                   "--recover", str(weights), "-o", str(out)])
    finally:
        os.chdir(cwd)
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert rc == 0
    return open(str(out) + "0").read()


def test_fastcar_device_matches_host(fc_weights):
    tmp, db, q, weights = fc_weights
    host = _run(tmp, db, q, weights, "host.search")
    dev = _run(tmp, db, q, weights, "dev.search",
               env={"MC2_FASTCAR_DEVICE": "1"})
    assert host == dev
    assert len(host.splitlines()) > 20  # the block actually found matches
