"""Training-path variants: slow feature set (log features on the selection
path) and block mutations (--mut-type both) must reach reference-level
accuracy and clean cluster structure."""
import os

import pytest

from meshclust2_tpu.cli import main
from meshclust2_tpu.io.clstr import parse_clstr


@pytest.mark.slow
@pytest.mark.parametrize("feat,mut", [("slow", "single"), ("fast", "both")])
def test_training_variant(fixtures_dir, tmp_path, feat, mut):
    out = tmp_path / "o.clstr"
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = main([
            "--id", "0.9", "--kmer", "5", "--mut-type", mut, "--feat", feat,
            "--output", str(out), "--device", "host",
            os.path.join(fixtures_dir, "small.fasta"),
        ])
    finally:
        os.chdir(cwd)
    assert rc == 0
    clusters = parse_clstr(str(out))
    # template purity must hold regardless of the trained feature set
    for c in clusters:
        templates = {m["header"].split("template_")[1] for m in c}
        assert len(templates) == 1
    assert 18 <= len(clusters) <= 24
