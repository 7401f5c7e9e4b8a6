"""DeviceSession + DeviceCombined (cluster/device_session.py) parity.

The combined program runs accumulate -> state conversion -> the whole
update/merge phase in ONE dispatch (VERDICT r4 next-step 7).  These tests
force a session on the CPU backend (MC2_FORCE_DEVICE_SESSION) and check
byte-exact CLSTR equality against the proven host path, including through
the abort-resume machinery.
"""
import os

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


def test_combined_session_parity(fixtures_dir, tmp_path):
    host = _run_cli(fixtures_dir, tmp_path, "host.clstr",
                    env={"MC2_NO_DEVICE_LOOP": "1",
                         "MC2_NO_DEVICE_SESSION": "1"})
    dev = _run_cli(fixtures_dir, tmp_path, "dev.clstr",
                   env={"MC2_FORCE_DEVICE_SESSION": "1",
                        "MC2_DEVICE_LOOP": "1",
                        "MC2_DEVICE_STRICT": "1"})
    _exact(host, dev)


def test_combined_session_abort_resume(fixtures_dir, tmp_path):
    """A moderate margin aborts the combined program mid-accumulate; the
    resolve -> diff-patch carry -> relaunch path must still produce the
    exact host output, with the phase result coming from the final
    relaunch."""
    host = _run_cli(fixtures_dir, tmp_path, "host.clstr",
                    env={"MC2_NO_DEVICE_LOOP": "1",
                         "MC2_NO_DEVICE_SESSION": "1"})
    dev = _run_cli(fixtures_dir, tmp_path, "dev.clstr",
                   env={"MC2_FORCE_DEVICE_SESSION": "1",
                        "MC2_DEVICE_LOOP": "1",
                        "MC2_DD_MARGIN": "3e-3"})
    _exact(host, dev)


def test_combined_session_fallback_phase_relaunch(fixtures_dir, tmp_path):
    """A margin storm exhausts the resume budget; the host completes the
    accumulate tail through the native resumable driver and the combined
    program is relaunched with a completion carry so the update phase
    still runs on device.  Output must stay exact."""
    host = _run_cli(fixtures_dir, tmp_path, "host.clstr",
                    env={"MC2_NO_DEVICE_LOOP": "1",
                         "MC2_NO_DEVICE_SESSION": "1"})
    dev = _run_cli(fixtures_dir, tmp_path, "dev.clstr",
                   env={"MC2_FORCE_DEVICE_SESSION": "1",
                        "MC2_DEVICE_LOOP": "1",
                        "MC2_DD_MARGIN": "1e9",
                        "MC2_DEV_MAX_RESUMES": "2"})
    _exact(host, dev)


def test_combined_session_segmented_phase(fixtures_dir, tmp_path):
    """MC2_PHASE_SEG=1 forces one-iteration phase segments (the device
    runtime kills any single dispatch executing >= ~60 s, so long phases
    run as bounded segments continued via completion-carry relaunches).
    Output must stay exact across the segment boundaries."""
    host = _run_cli(fixtures_dir, tmp_path, "host.clstr",
                    env={"MC2_NO_DEVICE_LOOP": "1",
                         "MC2_NO_DEVICE_SESSION": "1"},
                    fasta="med2000.fasta", weights="med2000_weights.txt")
    dev = _run_cli(fixtures_dir, tmp_path, "dev.clstr",
                   env={"MC2_FORCE_DEVICE_SESSION": "1",
                        "MC2_DEVICE_LOOP": "1",
                        "MC2_PHASE_SEG": "1"},
                   fasta="med2000.fasta", weights="med2000_weights.txt")
    _exact(host, dev)


def test_combined_session_med2000(fixtures_dir, tmp_path):
    """Larger pool: many clusters, real merges in the update phase."""
    host = _run_cli(fixtures_dir, tmp_path, "host.clstr",
                    env={"MC2_NO_DEVICE_LOOP": "1",
                         "MC2_NO_DEVICE_SESSION": "1"},
                    fasta="med2000.fasta", weights="med2000_weights.txt")
    dev = _run_cli(fixtures_dir, tmp_path, "dev.clstr",
                   env={"MC2_FORCE_DEVICE_SESSION": "1",
                        "MC2_DEVICE_LOOP": "1",
                        "MC2_DEVICE_STRICT": "1"},
                   fasta="med2000.fasta", weights="med2000_weights.txt")
    _exact(host, dev)
