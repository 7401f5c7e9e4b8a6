"""Multi-bin parity: 2000 sequences span two bvec bins, exercising the
reference's out-of-range window fallback, unstable-sort tie orders, and the
truncating distance_d accumulation.  Membership AND centers must match the
reference binary's single-threaded output."""
import os
from collections import Counter

import pytest

from meshclust2_tpu.cli import main
from meshclust2_tpu.io.clstr import parse_clstr


def center_signature(clusters):
    return Counter(
        (
            frozenset(m["header"] for m in c),
            tuple(sorted(m["header"] for m in c if m["center"])),
        )
        for c in clusters
    )


@pytest.mark.slow
def test_med2000_parity(fixtures_dir, tmp_path):
    out = tmp_path / "out.clstr"
    rc = main(
        [
            "--recover", os.path.join(fixtures_dir, "med2000_weights.txt"),
            "--output", str(out), "--device", "host",
            os.path.join(fixtures_dir, "med2000.fasta"),
        ]
    )
    assert rc == 0
    ref = parse_clstr(os.path.join(fixtures_dir, "med2000_ref.clstr"))
    got = parse_clstr(str(out))
    assert len(got) == len(ref) == 113
    assert center_signature(got) == center_signature(ref)
