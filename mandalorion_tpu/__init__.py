"""mandalorion_tpu — a TPU-native long-read RNA-seq isoform identification
and quantification engine.

A from-scratch re-design of the Mandalorion APDFQ pipeline
(reference: velociroger-pb/Mandalorion, `Mando.py:160-171`) for TPU hardware:

- ``align``    — splice-aware long-read aligner (minimizer seed → chain →
                 banded affine-gap fill) replacing minimap2; the banded DP
                 runs as a batched Pallas kernel on the MXU-adjacent VPU.
- ``poa``      — batched partial-order-alignment consensus replacing abPOA.
- ``core``     — the algorithmic heart (splice-site/TSS/polyA peak calling,
                 read→isoform grouping, isoform filtering, gene grouping,
                 quantification) expressed as vectorized segment ops.
- ``io``       — fastx / PSL / GTF / SAM / BED readers and writers.
- ``pipeline`` — APDFQ stage orchestration with the reference's
                 stage-artifact contract (tmp/ files as resume points).
- ``parallel`` — `jax.sharding.Mesh` based multi-chip / multi-host scaling:
                 reads data-parallel, loci sharded, quant merged via psum.
- ``utils``    — satellite tools (polyA trimming, TPM conversion, LRGASP
                 export, HLA typing, SNP phasing).
"""

__version__ = "0.1.0"

from mandalorion_tpu.config import PipelineConfig  # noqa: F401
