#!/usr/bin/env python3
"""Benchmark: end-to-end isoform pipeline throughput on one TPU chip.

Prints ONE JSON line. Headline metric: reads aligned+assigned per second
(full APDFQ on a config-1-style dataset, BASELINE.md) on the default
host-fused path, MEDIAN of 5 attempts with the full attempt spread
reported (`value_spread`) so host noise is visible instead of silently
moving the headline (VERDICT r3 weak #4).

The same line also carries:
- `device_path`: the same pipeline with the TPU compute backends selected
  end to end (chain_backend='device' + dp_backend='pallas'), reported as
  the median of the warm attempts AND the cold first attempt, plus
  `cold_kind` ('first-ever' vs 'warm-cache') resolved from whether the
  persistent XLA compilation cache already had entries (VERDICT r3 #9).
  `tunnel` embeds this run's measured dispatch round-trip latency and
  device->host bandwidth so the artifact itself shows what a tunneled
  dispatch costs (VERDICT r3 #2: evidence, not narrative).
- `poa`: graph-engine POA consensus throughput in bases/s through the
  FULL production consensus path — prepare_consensus_jobs (seeded
  subsample + orientation, the host phase production pays) followed by
  resolve_consensus_jobs — on a 16-isoform x 20-read x 2 kb synthetic
  workload (VERDICT r3 weak #8: the host phase is now included, not
  bypassed). Reported for the host C++ engine (production default) AND
  the batched device kernel on the chip (VERDICT r3 #3).

vs_baseline compares against the reference pipeline's MEASURED throughput
on this exact workload (tools/measure_reference_baseline.py): the
reference ran end-to-end with stub minimap2/abpoa binaries replaying our
precomputed alignments — its alignment and consensus compute FREE — at
106.92 reads/s (r1 measurement) and 77.3/91.9/94.8 reads/s re-measured at
r4 HEAD on the same box. vs_baseline uses the HIGHER r1 figure, i.e. the
conservative denominator; both appear in `baseline`.
"""

import contextlib
import json
import os
import signal
import statistics
import sys
import tempfile
import time

# measured via tools/measure_reference_baseline.py (see module docstring)
REFERENCE_READS_PER_SEC = 106.92        # r1 measurement (higher => conservative)
REFERENCE_READS_PER_SEC_R4 = [77.27, 91.91, 94.76]  # re-measured 2026-08-20
REFERENCE_READS_PER_SEC_R5 = 87.27      # re-measured 2026-08-21 (r5 HEAD)


class _Watchdog:
    """Hard wall-clock bound around a tunnel-dependent section: the axon
    device tunnel intermittently stalls for hundreds of seconds on the
    first device->host fetch (see NOTES.md r3); a stalled device probe
    must cost a bounded slice of the bench, never the headline."""

    def __init__(self, seconds: int):
        self.seconds = seconds

    def __enter__(self):
        def fire(signum, frame):
            raise TimeoutError(f"section exceeded {self.seconds}s "
                               "(device tunnel stall)")
        self._old = signal.signal(signal.SIGALRM, fire)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        return False


def _device_ready(retries: int = 3, wait_s: int = 20) -> bool:
    """Probe device-backend init in a SUBPROCESS before touching it here:
    the tunnel's backend factory intermittently fails at init ('Unable to
    initialize backend ...'), and once a factory init fails in-process jax
    discards it for good — so probe out-of-process, retry the transient
    flake, and only then let this process initialize the backend."""
    import subprocess
    for attempt in range(retries):
        ok = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=300).returncode == 0
        if ok:
            return True
        if attempt + 1 < retries:
            time.sleep(wait_s)
    return False


def _cache_entries() -> int:
    """Entry count of the persistent XLA compilation cache (0 on a
    machine's first-ever run; >0 => 'cold' attempts still reuse kernels)."""
    base = os.environ.get("MANDO_XLA_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "mandalorion_tpu", "xla")
    try:
        return sum(len(fs) for _d, _s, fs in os.walk(base))
    except OSError:
        return 0


def _tunnel_stats():
    """Measured cost of one device dispatch through this run's link:
    round-trip latency of a tiny jit dispatch+fetch, and D2H bandwidth."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((8, 128), jnp.float32)
    np.asarray(f(x))  # compile + first-touch
    t0 = time.time()
    for _ in range(10):
        np.asarray(f(x))
    lat_ms = (time.time() - t0) / 10 * 1000
    # a FRESH result array each fetch: np.asarray on the same jax.Array
    # returns a cached host copy after the first call
    g = jax.jit(lambda x, s: x + s)
    big = jax.device_put(np.ones(4 * 1024 * 1024, np.float32))
    np.asarray(g(big, 0.0))  # compile
    t0 = time.time()
    for i in range(3):
        np.asarray(g(big, float(i + 1)))
    bw = 3 * 16 / (time.time() - t0)
    return {"dispatch_roundtrip_ms": round(lat_ms, 1),
            "d2h_MB_per_s": round(bw, 1)}


LOADAVG = []  # 1-min load average sampled before each pipeline attempt


def _run_times(tmp, out_name, cfg, n_reads, attempts):
    from mandalorion_tpu.pipeline.stages import run_pipeline
    times = []
    for attempt in range(attempts):
        # box-weather context per attempt (VERDICT r4 weak #7): this VM
        # shares 2 cores; cross-round artifact deltas need the load
        # alongside the figure to separate code from neighbors
        LOADAVG.append(round(os.getloadavg()[0], 2))
        out_dir = os.path.join(tmp, f"{out_name}{attempt}")
        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):  # ONE json line
            run_pipeline(out_dir,
                         os.path.join(tmp, "genome.fasta"),
                         os.path.join(tmp, "ann.gtf"),
                         os.path.join(tmp, "reads.fasta"), cfg)
        times.append(time.time() - t0)
        quant = os.path.join(out_dir, "Isoforms.filtered.clean.quant")
        assert os.path.exists(quant) and os.path.getsize(quant) > 0
    return [n_reads / dt for dt in times]


def _absorb_first_fetch_stall() -> float:
    """Pay the axon tunnel's known first-fetch stall (hundreds of seconds
    on some runs) OUTSIDE the timed attempts (VERDICT r4 #3): one
    throwaway in-process dispatch+fetch; returns the seconds it absorbed."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 128), jnp.float32)))
    return time.time() - t0


def _poa_workload(n_iso=16, n_reads=20, length=2000):
    """(name, seq) read sets for the production consensus path (strings in,
    so subsample + orientation are part of the measurement)."""
    import numpy as np
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import synthdata
    rng = np.random.default_rng(0)
    sets = []
    for i in range(n_iso):
        true = synthdata.make_genome(length, seed=900 + i)
        reads = []
        for r in range(n_reads):
            seq, _ = synthdata.mutate_read(true, rng, 0.05)
            reads.append((f"i{i}r{r}", seq))
        sets.append(reads)
    bases = sum(len(s) for ss in sets for _n, s in ss)
    return sets, bases


def _poa_bases_per_s(backend, n_iso=16, n_reads=20, attempts=3):
    """Graph-engine POA bases/s through the FULL production path:
    prepare_consensus_jobs (subsample + orientation) +
    resolve_consensus_jobs on the given backend. Returns the per-attempt
    list (median-of-3 with spread in the artifact, VERDICT r4 #4: a
    slow-tunnel run must not silently halve the chip metric)."""
    import numpy as np
    from mandalorion_tpu.config import PoaConfig
    from mandalorion_tpu.poa.consensus import (prepare_consensus_jobs,
                                               resolve_consensus_jobs)
    sets, bases = _poa_workload(n_iso=n_iso, n_reads=n_reads)
    cfg = PoaConfig()

    def run():
        jobs = prepare_consensus_jobs(sets, cfg,
                                      np.random.default_rng(0))
        resolve_consensus_jobs(jobs, backend=backend)

    run()  # warmup (native build / kernel compiles, same shapes)
    out = []
    for _a in range(attempts):
        t0 = time.time()
        run()
        out.append(bases / (time.time() - t0))
    return out


def _fixture_status():
    """Keep the real-tool validation gap LOUD in every artifact (VERDICT
    r4 #9): count committed minimap2/abPOA fixtures; zero means the
    aligner/POA have still never been compared against the real tools
    (blocked on egress — tools/validate_against_real_tools.py generates
    them the moment binaries are reachable)."""
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "real_tool_fixtures")
    n = 0
    if os.path.isdir(base):
        n = sum(len(fs) for _d, _s, fs in os.walk(base))
    return {"committed": n,
            "note": ("validation against real minimap2/abPOA blocked on "
                     "egress" if n == 0 else "fixtures present")}


def main():
    from mandalorion_tpu.config import AlignConfig, PipelineConfig
    from mandalorion_tpu.utils.simulate import make_dataset

    threads = os.cpu_count() or 8
    cache_before = _cache_entries()
    with tempfile.TemporaryDirectory() as tmp:
        n_reads = make_dataset(tmp)
        # a fresh process runs its first TWO pipeline attempts ~2x slow
        # (modules D/A; CPU time stays flat while wall doubles with 3x
        # involuntary context switches — a process-start-correlated
        # effect of this shared VM, not our code; frequency ramp, malloc
        # arenas, and THP all ruled out by experiment, NOTES r5). Time
        # them as explicit warmup attempts and take the headline over
        # warm steady state, with every number in the artifact.
        warmup_rps = _run_times(tmp, "hostw",
                                PipelineConfig(threads=threads),
                                n_reads, attempts=2)
        host_rps = _run_times(tmp, "host", PipelineConfig(threads=threads),
                              n_reads, attempts=5)

        # the r3 default-engine flip (star -> graph POA, the abPOA
        # analogue) moved real consensus compute INTO the headline while
        # the measured reference baseline got its abPOA for free via
        # replay stubs; report the star fast path alongside so the
        # engine cost stays visible in the artifact, not just in NOTES
        from mandalorion_tpu.config import PoaConfig
        try:
            with _Watchdog(900):
                star_rps = _run_times(
                    tmp, "star",
                    PipelineConfig(threads=threads,
                                   poa=PoaConfig(engine="star")),
                    n_reads, attempts=3)
            # median like every other figure (VERDICT r4 weak #4)
            star = {"reads_per_s": round(statistics.median(star_rps), 2),
                    "spread": [round(x, 2) for x in star_rps]}
        except BaseException as e:  # never lose the headline to a flake
            star = f"error: {str(e)[:120]}"

        # device path: chain DP + Pallas affine-gap DP on the chip,
        # median of the warm attempts, cold first attempt alongside
        dev_dir = os.path.join(tmp, "dev_data")
        dev_reads = make_dataset(dev_dir, n_genes=4, n_reads_per_gene=75,
                                 genome_len=120_000)
        dev_cfg = PipelineConfig(
            threads=threads,
            align=AlignConfig(chain_backend="device", dp_backend="pallas"))
        try:
            with _Watchdog(1800):
                if not _device_ready():
                    raise TimeoutError("device backend init failing "
                                       "(tunnel down after retries)")
                # the first in-process fetch pays the tunnel's known
                # multi-hundred-second stall; absorb it before attempt 0
                # so reads_per_s_cold measures the pipeline, not the
                # tunnel's first-touch (VERDICT r4 #3)
                stall = _absorb_first_fetch_stall()
                rps = _run_times(dev_dir, "dev", dev_cfg, dev_reads,
                                 attempts=4)
                # host path on the SAME workload: the comparison VERDICT
                # r4 #1's done-bar asks for, embedded in the artifact
                host_same = _run_times(dev_dir, "devhost",
                                       PipelineConfig(threads=threads),
                                       dev_reads, attempts=3)
                tunnel = _tunnel_stats()
            device_path = {
                "reads_per_s": round(statistics.median(rps[1:]), 2),
                "reads_per_s_cold": round(rps[0], 2),
                "cold_kind": ("warm-cache" if cache_before
                              else "first-ever"),
                "stall_absorbed_s": round(stall, 2),
                "warm_spread": [round(x, 2) for x in rps[1:]],
                "host_same_workload": {
                    "reads_per_s": round(statistics.median(host_same), 2),
                    "spread": [round(x, 2) for x in host_same]},
                "reads": dev_reads,
                "backends": "chain=device dp=pallas (native staging, "
                            "2 fetches/batch)",
                "tunnel": tunnel,
            }
        except BaseException as e:  # never lose the headline to a flake
            device_path = {"error": str(e)[:200]}

        poa = {"workload": "16 isoforms x 20 reads x 2kb, warm, full "
                           "production path (subsample+orient+graph DP)"}
        try:
            with _Watchdog(900), contextlib.redirect_stdout(sys.stderr):
                host_attempts = _poa_bases_per_s("native")
            poa["bases_per_s_host"] = round(
                statistics.median(host_attempts), 1)
            poa["host_spread"] = [round(x, 1) for x in host_attempts]
        except BaseException as e:
            poa["bases_per_s_host"] = f"error: {str(e)[:120]}"
        try:
            with _Watchdog(1500), contextlib.redirect_stdout(sys.stderr):
                dev_attempts = _poa_bases_per_s("device")
            poa["bases_per_s_device"] = round(
                statistics.median(dev_attempts), 1)
            poa["device_spread"] = [round(x, 1) for x in dev_attempts]
        except BaseException as e:
            poa["bases_per_s_device"] = f"error: {str(e)[:120]}"

    print(json.dumps({
        "metric": "reads aligned+assigned per sec per chip (APDFQ e2e)",
        "value": round(statistics.median(host_rps), 2),
        "unit": "reads/s",
        "vs_baseline": round(statistics.median(host_rps)
                             / REFERENCE_READS_PER_SEC, 3),
        "value_spread": [round(x, 2) for x in host_rps],
        "warmup_reads_per_s": [round(x, 2) for x in warmup_rps],
        "value_spread_note": "a fresh process's first two attempts run "
                             "~2x slow (box-level, process-start-"
                             "correlated: CPU time stays flat while "
                             "wall doubles; see NOTES r5); they are "
                             "timed and reported as warmup_reads_per_s, "
                             "and the headline is the median of the "
                             "five warm attempts that follow",
        "baseline": {"reference_reads_per_s_r1": REFERENCE_READS_PER_SEC,
                     "reference_reads_per_s_r4_head":
                         REFERENCE_READS_PER_SEC_R4,
                     "reference_reads_per_s_r5_head":
                         REFERENCE_READS_PER_SEC_R5,
                     "note": "reference with free alignment+consensus "
                             "(replay stubs); vs_baseline uses the higher "
                             "r1 figure"},
        "star_engine": star,
        "device_path": device_path,
        "poa": poa,
        "loadavg_per_attempt": LOADAVG,
        "real_tool_fixtures": _fixture_status(),
    }))


if __name__ == "__main__":
    main()
