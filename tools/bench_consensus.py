#!/usr/bin/env python3
"""Consensus throughput: bases/sec for both engines (the BASELINE.json
'POA consensus bases/sec' driver metric). Prints one JSON line."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import numpy as np
    import synthdata
    from mandalorion_tpu.config import PoaConfig
    from mandalorion_tpu.poa.consensus import determine_consensus

    rng = np.random.default_rng(0)
    results = {}
    for engine, n_isoforms, n_reads, length in [
        ("star", 40, 40, 1500),
        ("graph", 6, 20, 800),
    ]:
        isoforms = []
        for i in range(n_isoforms):
            true = synthdata.make_genome(length, seed=100 + i)
            reads = []
            for r in range(n_reads):
                seq, _ = synthdata.mutate_read(true, rng, 0.01)
                reads.append((f"i{i}r{r}", seq))
            isoforms.append((true, reads))
        t0 = time.time()
        total_bases = 0
        correct = 0
        for true, reads in isoforms:
            cons, _names = determine_consensus(
                reads, PoaConfig(engine=engine))
            total_bases += sum(len(s) for _n, s in reads)
            correct += int(cons == true)
        dt = time.time() - t0
        results[engine] = {
            "bases_per_s": round(total_bases / dt),
            "exact_consensus": f"{correct}/{n_isoforms}",
        }
    print(json.dumps({
        "metric": "consensus input bases per sec (single thread)",
        **results,
    }))


if __name__ == "__main__":
    main()
