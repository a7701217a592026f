"""`pytest -m device` smoke subset: gate a commit in <5 minutes COLD.

One tiny index, one batch shape (W=64, B=256 — the smallest ladder
rung), and exactly one pass through each query strategy's device graph:
full-intersection, threshold-union, kmer-conservation, kmer-matches,
with the FULGOR_SELFCHECK runtime oracle verifying every FI/TU read
against the exact host mirror. The full suite compiles many wide probe
variants (a ~30 min cold-cache wall — how round 3 shipped a red test);
this subset compiles four small graphs.

Run: python -m pytest -m device -x -q
"""

import numpy as np
import pytest

from fulgor_tpu.build.builder import build_index
from fulgor_tpu.core import kmers as K
from fulgor_tpu.query.engine import QueryEngine
from tests.test_ccdbg import random_genomes
from tests.test_native import write_fasta

pytestmark = pytest.mark.device

K_LEN = 15


@pytest.fixture(scope="module")
def smoke(tmp_path_factory):
    rng = np.random.default_rng(11)
    tmp = tmp_path_factory.mktemp("smoke")
    genomes = random_genomes(rng, num_colors=4, length=1500, mut=0.02,
                             k=K_LEN)
    paths = []
    for i, seqs in enumerate(genomes):
        p = str(tmp / f"g{i}.fa")
        write_fasta(p, seqs, gz=False)
        paths.append(p)
    idx = build_index(paths, k=K_LEN, m=9)
    reads = []
    L = 60
    for _ in range(300):
        g = int(rng.integers(0, len(genomes)))
        s = genomes[g][0]
        p = int(rng.integers(0, len(s) - L))
        reads.append(s[p: p + L])
    reads.append(K.codes_to_seq(rng.integers(0, 4, size=L).astype(np.uint8)))
    qfile = str(tmp / "reads.fq")
    with open(qfile, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    eng = QueryEngine(idx, batch_size=256, use_mesh=False)
    eng._selfcheck = 1  # runtime oracle: every read vs the exact host mirror
    return tmp, eng, qfile, len(reads)


def test_smoke_full_intersection(smoke, tmp_path):
    tmp, eng, qfile, n = smoke
    out = str(tmp_path / "fi.tsv")
    stats = eng.pseudoalign_file(qfile, out)
    assert stats["num_reads"] == n
    lines = open(out, "rb").readlines()
    assert len(lines) == n


def test_smoke_threshold_union(smoke, tmp_path):
    tmp, eng, qfile, n = smoke
    out = str(tmp_path / "tu.tsv")
    stats = eng.pseudoalign_file(qfile, out, threshold=0.8)
    assert stats["num_reads"] == n
    assert len(open(out, "rb").readlines()) == n


def test_smoke_kmer_conservation(smoke, tmp_path):
    tmp, eng, qfile, n = smoke
    out = str(tmp_path / "kc.tsv")
    stats = eng.kmer_conservation_file(qfile, out)
    assert stats["num_reads"] == n
    lines = open(out, "rb").readlines()
    assert len(lines) == n
    assert lines[-1].startswith(b"r300\t0")  # junk read conserves nothing


def test_smoke_kmer_matches(smoke, tmp_path):
    tmp, eng, qfile, n = smoke
    out = str(tmp_path / "km.tsv")
    stats = eng.kmer_matches_file(qfile, out)
    assert stats["num_reads"] == n
    lines = open(out, "rb").readlines()
    assert lines[0].startswith(b"num_colors=")  # header (reference format)
    assert len(lines) == n + 1
