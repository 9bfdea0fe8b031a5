"""Sharded collective steps used by the mesh-integrated pipeline.

The production integration lives in the batched dispatch sites themselves
(align/chain_kernel.py, align/kernels.py, poa/kernels.py consult
parallel.mesh.pipeline_mesh and shard their batch axes); this module holds
the explicitly-collective pieces: the quant count-matrix psum merge
(module Q's cross-shard reduction, `mesh_count_matrix`), sharded alignment
scoring, and the hash-axis-sharded genome-index lookup (the path to
indexes larger than one host's memory). SURVEY §2.3 merge collectives.
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


def shard_index_arrays(index, n_shards: int):
    """Split a GenomeIndex's (sorted_hashes, sorted_positions) into
    n_shards hash-range shards for device sharding. Split points snap to
    bucket boundaries so equal hashes never straddle shards (a hash's
    occurrence count — the max_occ repeat filter — stays exact on its
    owner shard). Returns (hashes (n,S), positions (n,S), lens (n,)),
    padded with the max-hash sentinel."""
    import numpy as np
    total = len(index.sorted_hashes)
    cuts = [0]
    for i in range(1, n_shards):
        target = i * total // n_shards
        b = int(np.searchsorted(index.bucket_lo, target, side="left"))
        cuts.append(int(index.bucket_lo[min(b, len(index.bucket_lo) - 1)]))
    cuts.append(total)
    cuts = sorted(cuts)
    lens = np.array([cuts[i + 1] - cuts[i] for i in range(n_shards)],
                    np.int32)
    width = max(int(lens.max()), 1)
    hashes = np.full((n_shards, width), np.uint64(0xFFFFFFFFFFFFFFFF))
    positions = np.zeros((n_shards, width), np.int64)
    for i in range(n_shards):
        sl = slice(cuts[i], cuts[i + 1])
        hashes[i, :lens[i]] = index.sorted_hashes[sl]
        positions[i, :lens[i]] = index.sorted_positions[sl].astype(np.int64)
    return hashes, positions, lens


def sharded_index_lookup(mesh: Mesh, shard_hashes, shard_positions,
                         shard_lens, queries, max_occ: int):
    """Seed lookup against a hash-axis-sharded genome index: each device
    binary-searches its own shard, expands up to max_occ hits per query,
    and the candidate hits all_gather across the axis (SURVEY §2.3's
    sharded-index alternative to per-host index replication). Returns
    (positions (n_shards, nq, max_occ), valid mask) — a query's hits live
    on the single shard owning its hash range. Runs under the x64 context
    (the 64-bit minimizer hashes would truncate in 32-bit mode)."""
    axis = mesh.axis_names[0]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(None)),
        out_specs=(P(None, None, None), P(None, None, None),
                   P(None, None)),
        **{_CHECK_KW: False})  # all_gather replication is real
    def run(h2, p2, ln2, q):
        h, p, ln = h2[0], p2[0], ln2[0]
        lo = jnp.searchsorted(h, q, side="left")
        hi = jnp.searchsorted(h, q, side="right")
        cnt = hi - lo
        # exclude hits into this shard's sentinel padding
        cnt = jnp.minimum(cnt, jnp.maximum(ln - lo, 0))
        k = jnp.arange(max_occ)
        idx = lo[:, None] + k[None, :]
        valid = ((k[None, :] < cnt[:, None])
                 & (cnt[:, None] <= max_occ)
                 & (idx < ln))  # padding sentinel hits excluded
        pos = jnp.take(p, jnp.clip(idx, 0, h.shape[0] - 1))
        pos = jnp.where(valid, pos, -1)
        return (jax.lax.all_gather(pos, axis),
                jax.lax.all_gather(valid, axis),
                jax.lax.all_gather(cnt, axis))

    with jax.enable_x64(True):
        return run(shard_hashes, shard_positions, shard_lens, queries)


def mesh_count_matrix(mesh: Mesh, flat_ids: "np.ndarray",
                      num_segments: int) -> "np.ndarray":
    """The quant count matrix's cross-shard reduction (module Q): the
    flattened (isoform*n_samples + sample) id stream shards over ALL mesh
    axes, each device segment-sums its shard, and the partial matrices
    merge with one psum riding ICI — the collective replacing
    assignReadsToIsoforms' single-process count loop
    (`assignReadsToIsoforms.py:27-48`, SURVEY §2.3). Integer counts, so
    the merge is exact: byte-identical to np.bincount on one device.

    flat_ids: int array of segment ids; returns int64 counts[num_segments].
    """
    import numpy as np
    from mandalorion_tpu.parallel.mesh import shard_batch

    axes = tuple(mesh.axis_names)
    n_dev = int(mesh.devices.size)
    ids = np.asarray(flat_ids, np.int32)
    # pad to a device multiple with the overflow bucket (dropped after
    # the merge) BEFORE sharding — zero would be a real isoform id
    padded_n = max(((len(ids) + n_dev - 1) // n_dev) * n_dev, n_dev)
    padded = np.full(padded_n, num_segments, np.int32)
    padded[:len(ids)] = ids
    (ids_sharded,), _n = shard_batch(mesh, [padded])

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axes),),
                       out_specs=P(None),
                       **{_CHECK_KW: False})  # psum replication is real
    def run(shard_ids):
        counts = jax.ops.segment_sum(
            jnp.ones_like(shard_ids, jnp.int32), shard_ids,
            num_segments=num_segments + 1)
        return jax.lax.psum(counts, axes)

    from mandalorion_tpu.parallel.mesh import fetch_global
    merged = fetch_global(run(ids_sharded))
    return merged[:num_segments].astype(np.int64)
