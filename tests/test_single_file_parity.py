"""--single-file + --no-train-list recover-path parity vs the reference
binary (BASELINE config 4: joined multi-contig assemblies, 50-N gaps, with
ten of the thirty files excluded from training)."""
import os
from collections import Counter

import pytest

from meshclust2_tpu.cli import main
from meshclust2_tpu.io.clstr import parse_clstr


def test_single_file_notrain_parity(fixtures_dir, tmp_path):
    base = os.path.join(fixtures_dir, "singlefile")
    files = sorted(
        os.path.join(base, "asm", f)
        for f in os.listdir(os.path.join(base, "asm"))
        if f.endswith(".fa")
    )
    assert len(files) == 30
    train_list = tmp_path / "train.txt"
    notrain_list = tmp_path / "no.txt"
    train_list.write_text("\n".join(files[:20]) + "\n")
    notrain_list.write_text("\n".join(files[20:]) + "\n")
    out = tmp_path / "out.clstr"
    rc = main([
        "--recover", os.path.join(base, "sf_weights.txt"),
        "--single-file",
        "--list", str(train_list),
        "--no-train-list", str(notrain_list),
        "--output", str(out), "--device", "host",
    ])
    assert rc == 0
    ref = parse_clstr(os.path.join(base, "ref_sf_rec.clstr"))
    got = parse_clstr(str(out))

    def cents(cl):
        return Counter(
            (
                frozenset(m["header"] for m in c),
                tuple(sorted(m["header"] for m in c if m["center"])),
            )
            for c in cl
        )

    assert len(got) == len(ref) == 6
    assert cents(got) == cents(ref)
