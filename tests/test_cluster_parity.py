"""End-to-end recover-path parity: our mean-shift engine must reproduce the
reference binary's CLSTR output (cluster membership and centers) on the
golden fixture, using the reference-trained weights."""
import os
import subprocess
import sys

import pytest

from meshclust2_tpu.io.clstr import parse_clstr


def cluster_signature(clusters):
    memb = sorted(frozenset(m["header"] for m in c) for c in clusters)
    cent = sorted(
        (
            frozenset(m["header"] for m in c),
            tuple(sorted(m["header"] for m in c if m["center"])),
        )
        for c in clusters
    )
    return memb, cent


@pytest.mark.parametrize("device", ["host"])
def test_recover_clstr_parity(fixtures_dir, tmp_path, device):
    out = tmp_path / "out.clstr"
    from meshclust2_tpu.cli import main

    rc = main(
        [
            "--recover",
            os.path.join(fixtures_dir, "small_ref_weights.txt"),
            "--output",
            str(out),
            "--device",
            device,
            os.path.join(fixtures_dir, "small.fasta"),
        ]
    )
    assert rc == 0
    ref = parse_clstr(os.path.join(fixtures_dir, "small_ref.clstr"))
    got = parse_clstr(str(out))
    assert len(got) == len(ref)
    ref_m, ref_c = cluster_signature(ref)
    got_m, got_c = cluster_signature(got)
    assert got_m == ref_m, "cluster memberships differ from reference"
    assert got_c == ref_c, "cluster centers differ from reference"
