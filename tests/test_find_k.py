"""Auto-k parity: the reference's find_k averages makeChromList effective
sizes, which its space-preallocation bug doubles (verified against the
binary: avg length 2064 -> K 5 on the small fixture)."""
import os

from meshclust2_tpu.io.fasta import read_fasta
from meshclust2_tpu.kmer.counting import find_k


def test_find_k_matches_reference(fixtures_dir):
    recs = read_fasta(os.path.join(fixtures_dir, "small.fasta"))
    assert sum(r.ref_list_effective_size for r in recs) // len(recs) == 2064
    assert find_k([recs], 1) == 5


def test_doubled_effective_size_shape(fixtures_dir):
    recs = read_fasta(os.path.join(fixtures_dir, "small.fasta"))
    for r in recs[:10]:
        # pure-ACGT records: doubled buffer is one unbroken run
        assert r.ref_list_effective_size == r.total_size + r.effective_size
