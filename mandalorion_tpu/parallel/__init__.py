"""Multi-chip / multi-host scaling (SURVEY §2.3 parallel axes).

The reference's only parallelism is single-box process pools
(`emtrey.py:154`, `defineIsoforms.py:130`, `filterIsoforms.py:497`). Here
the axes are first-class device-mesh dimensions:

- ``reads`` — data parallel over read batches (alignment, module A);
- ``loci``  — independent genomic loci (modules D/F);

with XLA collectives replacing the reference's filesystem merges: per-locus
histograms and quant count matrices merge via ``psum``; locus boundary
tables via ``all_gather``; ring ``ppermute`` keeps traffic on ICI.
"""

from mandalorion_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, pipeline_mesh, use_mesh)
from mandalorion_tpu.parallel.dist import (  # noqa: F401
    mesh_count_matrix, sharded_batch_score, sharded_quant_merge)
