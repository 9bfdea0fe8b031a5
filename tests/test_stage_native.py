"""Native device-path staging (stage_*_batch_c) parity.

The staged device path (aligner._map_batch_device_staged: C seed ->
chain kernel -> C fill -> fused DP kernel -> C emit, two fetches total)
must be byte-identical to the Python-staged device path AND to the host
path — the same invariant the backend-parity tests enforce pairwise
(VERDICT r4 #1: both paths share the native staging engine).
"""

import os

import pytest

from mandalorion_tpu.config import AlignConfig
from mandalorion_tpu.align.aligner import SpliceAligner
from mandalorion_tpu.native import load_native

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="native library unavailable")


def _dataset(tmp_path, seed=0, n_genes=3, reads_per_gene=20):
    from mandalorion_tpu.utils.simulate import make_dataset
    from mandalorion_tpu.io.fastx import read_fastx, fastx_to_dict
    d = str(tmp_path / f"ds{seed}")
    make_dataset(d, n_genes=n_genes, n_reads_per_gene=reads_per_gene,
                 genome_len=30_000 * n_genes, seed=seed)
    genome = fastx_to_dict(os.path.join(d, "genome.fasta"))
    reads = [(nm, sq) for nm, sq, _q in
             read_fastx(os.path.join(d, "reads.fasta"))]
    return genome, reads


def test_staged_matches_python_and_host(tmp_path):
    genome, reads = _dataset(tmp_path)
    host = SpliceAligner(genome, AlignConfig())
    dev = SpliceAligner(genome, AlignConfig(chain_backend="device",
                                            dp_backend="rowscan"))
    out_host = [str(r) for r in host.map_batch(reads)]
    staged = dev._map_batch_device_staged(reads)
    assert staged is not None, "staged path unexpectedly unavailable"
    out_staged = [str(r) for r in staged]
    # the python-staged device path (bypassing the native staging)
    picks = dev._chain_batch_device(reads)
    from mandalorion_tpu.align.aligner import cfg_min_len
    from mandalorion_tpu.align.extend import DpProblem
    problems, pendings = [], []
    for (name, seq), picked in zip(reads, picks):
        if picked is None:
            continue
        chain, strand, ci, q_codes = picked
        if float(sum(s.length for s in chain)) < cfg_min_len(dev.cfg):
            continue
        pend = dev._fill(name, seq, strand, q_codes, chain, ci, problems)
        if pend is not None:
            pendings.append(pend)
    modes = [p.mode for p in problems]
    results = dev.dp_backend(problems, dev.cfg)
    out_py = []
    for pend in pendings:
        rec = dev._emit(pend, results, modes)
        if rec is not None:
            out_py.append(str(rec))

    assert out_staged == out_py, "staged != python-staged device path"
    assert out_staged == out_host, "staged device path != host path"


def test_staged_handles_unalignable_and_empty(tmp_path):
    genome, reads = _dataset(tmp_path, seed=1, n_genes=2, reads_per_gene=5)
    dev = SpliceAligner(genome, AlignConfig(chain_backend="device",
                                            dp_backend="rowscan"))
    # junk reads seed no candidates; an empty batch returns []
    junk = [("junk1", "ACGT" * 8), ("junk2", "TTTTGGGGCCCCAAAA")]
    out = dev._map_batch_device_staged(reads + junk)
    host = SpliceAligner(genome, AlignConfig())
    assert [str(r) for r in out] == \
        [str(r) for r in host.map_batch(reads + junk)]
    assert dev._map_batch_device_staged([]) == []


def test_staged_via_public_map_batch(tmp_path):
    """map_batch routes chain_backend='device' through the staged path
    (same records, public surface)."""
    genome, reads = _dataset(tmp_path, seed=2)
    host = SpliceAligner(genome, AlignConfig())
    dev = SpliceAligner(genome, AlignConfig(chain_backend="device",
                                            dp_backend="rowscan"))
    assert [str(r) for r in dev.map_batch(reads)] == \
        [str(r) for r in host.map_batch(reads)]


def test_staged_multichromosome(tmp_path):
    """Candidates split per chromosome and must iterate read -> strand ->
    chromosome ASCENDING in the native seed stage, matching the Python
    staging's pick order — a 3-chromosome genome exercises the ordering
    and the cross-chromosome tie-breaks end to end."""
    import numpy as np
    sys_path = __import__("sys").path
    import synthdata
    from mandalorion_tpu.io.fastx import revcomp

    rng = np.random.default_rng(5)
    genomes = {}
    reads = []
    for ci in range(3):
        chrom = f"chr{ci + 1}"
        genome = synthdata.make_genome(25_000, seed=300 + ci)
        base = 4000
        exons = [(base, base + 400), (base + 1500, base + 2000),
                 (base + 3500, base + 3900)]
        strand = "+" if ci % 2 == 0 else "-"
        genome = synthdata.plant_introns(genome, exons, strand=strand)
        t = synthdata.transcript_seq(genome, exons)
        if strand == "-":
            t = revcomp(t)
        for k in range(15):
            r, _ = synthdata.mutate_read(t, rng, 0.03)
            reads.append((f"c{ci}r{k}", r))
        genomes[chrom] = genome

    host = SpliceAligner(genomes, AlignConfig())
    dev = SpliceAligner(genomes, AlignConfig(chain_backend="device",
                                             dp_backend="rowscan"))
    out_staged = dev._map_batch_device_staged(reads)
    assert out_staged is not None
    assert [str(r) for r in out_staged] == \
        [str(r) for r in host.map_batch(reads)]


def test_staged_seed_capacity_retry_and_cross_chrom_candidates(tmp_path):
    """Reads homologous to ALL chromosomes produce 2*chroms candidates
    per read — more than the seed stage's initial 2-per-read capacity
    guess, so the -needed retry path runs; the best-candidate pick must
    still match the Python staging's strict-> order across chromosomes
    (first chromosome wins score ties)."""
    import numpy as np
    import synthdata

    rng = np.random.default_rng(9)
    core = synthdata.make_genome(6000, seed=77)
    genomes = {}
    for ci in range(6):
        # same core sequence on every chromosome, lightly diverged on
        # all but chr1 so chr1 wins most picks but others still seed
        g = list(core)
        for _ in range(ci * 25):
            p = int(rng.integers(0, len(g)))
            g[p] = "ACGT"[int(rng.integers(0, 4))]
        genomes[f"chr{ci + 1}"] = "".join(g)
    reads = []
    for k in range(20):
        r, _ = synthdata.mutate_read(core[500:3500], rng, 0.02)
        reads.append((f"r{k}", r))
    # 20 reads x 2 orientations x up-to-6 chromosomes > the initial
    # cap of max(64, 2*n_reads): the -needed retry must run
    host = SpliceAligner(genomes, AlignConfig())
    dev = SpliceAligner(genomes, AlignConfig(chain_backend="device",
                                             dp_backend="rowscan"))
    out = dev._map_batch_device_staged(reads)
    assert out is not None
    assert [str(r) for r in out] == [str(r) for r in host.map_batch(reads)]
