"""Config-2-style adversarial truth-set gates (BASELINE.json configs[1]).

The dataset plants the structures that break isoform callers — overlapping
same-strand genes, an antisense pair, shared-exon (exon-skipping)
isoforms, and a processed-pseudogene decoy on another chromosome — and the
gates assert exact recovery: every truth junction chain called, no isoform
at the decoy, and read assignment pure. The decoy case is what forced the
chain score onto anchor coverage (Segment.cov) instead of segment span —
span scoring let the merge-gap-bridged decoy outscore the true spliced
parent (chain.py collapse_anchors).
"""

import json
import os

from mandalorion_tpu.config import PipelineConfig
from mandalorion_tpu.pipeline.stages import run_pipeline
from mandalorion_tpu.utils.simulate import (evaluate_adversarial,
                                            make_adversarial_dataset)


def test_adversarial_truth_set_gates(tmp_path):
    truth = make_adversarial_dataset(str(tmp_path), reads_per_isoform=12)
    run_pipeline(str(tmp_path / "out"), str(tmp_path / "genome.fasta"),
                 str(tmp_path / "ann.gtf"), str(tmp_path / "reads.fasta"),
                 PipelineConfig(threads=1))
    m = evaluate_adversarial(str(tmp_path / "out"), truth)
    assert m["isoform_recall"] == 1.0, m
    assert m["junction_recall"] == 1.0, m
    assert m["pseudogene_false_calls"] == [], m
    assert m["read_purity"] >= 0.95, m
    # nothing beyond the truth set is invented on this clean dataset
    assert m["n_out_isoforms"] == len(truth["isoforms"]), m
