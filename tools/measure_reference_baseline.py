#!/usr/bin/env python3
"""Measure the reference pipeline's wall-clock on the bench workload.

minimap2/abpoa are not installable here (zero egress), so the reference
runs with STUB binaries that replay precomputed alignments produced by our
aligner (and an abpoa stub whose empty output triggers the reference's
first-sequence fallback). That gives the reference its A-module and
consensus compute FOR FREE — the measured figure is therefore an upper
bound on reference throughput for this workload, i.e. a conservative
baseline for bench.py's vs_baseline.

Usage: python tools/measure_reference_baseline.py [reads_per_gene]
Prints a JSON line with the measured reference reads/s.
"""

import json
import os
import stat
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REFERENCE = "/root/reference"


def main():
    from mandalorion_tpu.config import AlignConfig, PipelineConfig
    from mandalorion_tpu.pipeline.stages import run_pipeline
    from mandalorion_tpu.utils.simulate import make_dataset

    n_per_gene = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    tmp = tempfile.mkdtemp(prefix="refbase_")
    n_reads = make_dataset(tmp, n_reads_per_gene=n_per_gene)

    # 1) our aligner produces the SAM the stub minimap2 will replay
    cfg = PipelineConfig(align=AlignConfig(emit_sam=True))
    ours = os.path.join(tmp, "ours")
    run_pipeline(ours, os.path.join(tmp, "genome.fasta"),
                 os.path.join(tmp, "ann.gtf"),
                 os.path.join(tmp, "reads.fasta"), cfg)
    reads_sam = os.path.join(ours, "tmp", "mm2Alignments.sam")

    # 2) align the reference's would-be consensi: its consensus falls back
    #    to a member read, so realigning OUR consensi is representative;
    #    rename to the reference's own names via its Isoform_Consensi run
    #    later — for timing, replaying our consensi SAM suffices.
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.io.fastx import fastx_to_dict
    from mandalorion_tpu.io.psl import read_psl
    from mandalorion_tpu.io.sam import write_sam
    genome = fastx_to_dict(os.path.join(tmp, "genome.fasta"))

    # 3) stub tools
    bin_dir = os.path.join(tmp, "bin")
    os.makedirs(bin_dir)
    mm2 = os.path.join(bin_dir, "minimap2")
    with open(mm2, "w") as fh:
        fh.write(f"""#!/bin/bash
# replay stub: consensus realignment inputs contain 'Isoform_Consensi';
# everything else gets the read alignment SAM
for arg in "$@"; do
  if [[ "$arg" == *Isoform_Consensi* ]]; then
    python3 {REPO}/tools/_align_stub.py {tmp}/genome.fasta "$arg"
    exit 0
  fi
done
cat {reads_sam}
""")
    os.chmod(mm2, 0o755)
    abpoa = os.path.join(bin_dir, "abpoa")
    with open(abpoa, "w") as fh:
        fh.write("#!/bin/bash\nexit 0\n")  # empty output -> fallback
    os.chmod(abpoa, 0o755)
    scp = os.path.join(bin_dir, "scp")  # image has no scp; cp suffices
    with open(scp, "w") as fh:
        fh.write("#!/bin/bash\ncp \"$@\"\n")
    os.chmod(scp, 0o755)

    # 4) timed run of the reference pipeline (stub mappy on PYTHONPATH)
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.join(REPO, "tests", "stubs")
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env["PATH"] = bin_dir + os.pathsep + env.get("PATH", "")
    ref_out = os.path.join(tmp, "ref")
    os.makedirs(ref_out)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "Mando.py"),
         "-p", ref_out, "-g", os.path.join(tmp, "ann.gtf"),
         "-G", os.path.join(tmp, "genome.fasta"),
         "-f", os.path.join(tmp, "reads.fasta"),
         "-t", "8", "--mm2_path", mm2],
        env=env, capture_output=True, text=True, timeout=3600)
    dt = time.time() - t0
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    quant = os.path.join(ref_out, "Isoforms.filtered.clean.quant")
    ok = os.path.exists(quant) and os.path.getsize(quant) > 0
    print(json.dumps({
        "reference_wall_s": round(dt, 2),
        "n_reads": n_reads,
        "reference_reads_per_s": round(n_reads / dt, 2),
        "completed": ok,
        "note": "stubbed minimap2 (replays our SAM) + stubbed abpoa "
                "(first-seq fallback): alignment+consensus free for the "
                "reference; conservative baseline",
    }))


if __name__ == "__main__":
    main()
