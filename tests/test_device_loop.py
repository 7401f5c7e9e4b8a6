"""Device-resident accumulate loop (cluster/device_loop.py) parity.

Runs the on-device while_loop program on the CPU backend and checks exact
CLSTR equality (member order included) against the proven host path, plus
the guarded-abort -> host-resume machinery under forced margins.
"""
import os

import numpy as np
import pytest

from meshclust2_tpu.io.clstr import parse_clstr


def _run_cli(fixtures_dir, tmp_path, name, env=None, fasta="small.fasta",
             weights="small_ref_weights.txt"):
    from meshclust2_tpu.cli import main

    out = tmp_path / name
    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        rc = main([
            "--recover", os.path.join(fixtures_dir, weights),
            "--output", str(out),
            "--device", "host",
            os.path.join(fixtures_dir, fasta),
        ])
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert rc == 0
    return parse_clstr(str(out))


def _exact(a, b):
    assert len(a) == len(b)
    for ca, cb in zip(a, b):
        assert [m["header"] for m in ca] == [m["header"] for m in cb]
        assert [m["center"] for m in ca] == [m["center"] for m in cb]


def test_device_loop_small_parity(fixtures_dir, tmp_path):
    host = _run_cli(fixtures_dir, tmp_path, "host.clstr",
                    env={"MC2_NO_DEVICE_LOOP": "1"})
    dev = _run_cli(fixtures_dir, tmp_path, "dev.clstr",
                   env={"MC2_DEVICE_LOOP": "1", "MC2_DEVICE_STRICT": "1"})
    _exact(host, dev)


def test_device_loop_abort_resume_everywhere(fixtures_dir, tmp_path, capsys):
    """A giant margin makes the very first decision uncertain: the device
    must abort cleanly and the host continuation must reproduce the exact
    output."""
    host = _run_cli(fixtures_dir, tmp_path, "host.clstr",
                    env={"MC2_NO_DEVICE_LOOP": "1"})
    dev = _run_cli(fixtures_dir, tmp_path, "dev.clstr",
                   env={"MC2_DEVICE_LOOP": "1", "MC2_DD_MARGIN": "1e9"})
    _exact(host, dev)


@pytest.mark.parametrize("margin", ["3e-3", "2e-2"])
def test_device_loop_midrun_abort(fixtures_dir, tmp_path, margin):
    """Moderate margins abort somewhere mid-run; the stitched
    device-then-host output must still be exact."""
    host = _run_cli(fixtures_dir, tmp_path, "host.clstr",
                    env={"MC2_NO_DEVICE_LOOP": "1"})
    dev = _run_cli(fixtures_dir, tmp_path, "dev.clstr",
                   env={"MC2_DEVICE_LOOP": "1", "MC2_DD_MARGIN": margin})
    _exact(host, dev)


@pytest.mark.slow
def test_device_loop_med2000_parity(fixtures_dir, tmp_path):
    host = _run_cli(fixtures_dir, tmp_path, "host.clstr",
                    env={"MC2_NO_DEVICE_LOOP": "1"},
                    fasta="med2000.fasta", weights="med2000_weights.txt")
    dev = _run_cli(fixtures_dir, tmp_path, "dev.clstr",
                   env={"MC2_DEVICE_LOOP": "1", "MC2_DEVICE_STRICT": "1"},
                   fasta="med2000.fasta", weights="med2000_weights.txt")
    _exact(host, dev)


def test_ddf32_jit_exactness():
    """Canary for backend fast-math rewrites: the dd pipeline must keep
    ~2^-45 accuracy UNDER JIT (XLA:CPU once contracted a rematerialized
    product into `p + e`, collapsing dd to f32; see ddf32._harden)."""
    import jax
    import numpy as np

    from meshclust2_tpu.ops import ddf32 as DD

    rng = np.random.default_rng(1)
    c64 = rng.random(4096)
    C = DD.dd(*DD.split_f64(c64))
    w = 0.211728345557612
    wd = DD.split_f64(np.float64(w))

    def chain(ch, cl):
        x = DD.dd_mul((ch, cl), (np.float32(wd[0]), np.float32(wd[1])))
        y = DD.dd_div(x, DD.dd_sqrt((ch, cl)))
        return DD.dd_add(x, y)

    rh, rl = jax.jit(chain)(*C)
    got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    want = w * c64 + w * c64 / np.sqrt(c64)
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 1e-12, rel.max()
