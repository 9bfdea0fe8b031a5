#!/usr/bin/env python3
"""Config-2 acceptance run (BASELINE.json configs[1]): adversarial
truth-set dataset -> full APDFQ pipeline -> recall/purity gates.

Usage: python tools/run_config2.py [reads_per_isoform] [threads]

Prints the metrics JSON and exits nonzero if any gate fails:
isoform_recall == 1.0, junction_recall == 1.0, no pseudogene false
calls, read_purity >= 0.95.
"""

import json
import os
import sys
import tempfile
import time


def main() -> int:
    reads_per = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count()
                                                         or 2)
    from mandalorion_tpu.config import PipelineConfig
    from mandalorion_tpu.pipeline.stages import run_pipeline
    from mandalorion_tpu.utils.simulate import (evaluate_adversarial,
                                                make_adversarial_dataset)
    with tempfile.TemporaryDirectory() as tmp:
        truth = make_adversarial_dataset(tmp, reads_per_isoform=reads_per)
        t0 = time.time()
        run_pipeline(os.path.join(tmp, "out"),
                     os.path.join(tmp, "genome.fasta"),
                     os.path.join(tmp, "ann.gtf"),
                     os.path.join(tmp, "reads.fasta"),
                     PipelineConfig(threads=threads))
        dt = time.time() - t0
        m = evaluate_adversarial(os.path.join(tmp, "out"), truth)
    m["reads"] = truth["n_reads"]
    m["wall_s"] = round(dt, 2)
    print(json.dumps(m, indent=2))
    ok = (m["isoform_recall"] == 1.0 and m["junction_recall"] == 1.0
          and not m["pseudogene_false_calls"]
          and m["read_purity"] >= 0.95)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
