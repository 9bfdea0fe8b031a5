"""Multi-device sharding tests on the 8-device virtual CPU mesh:
sharded scoring, quant psum merge, and the full training step
(SURVEY §4 distributed level: N = 1, 2, 8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mandalorion_tpu.parallel.dist import (
    _score_batch, sharded_batch_score, sharded_quant_merge, training_step)
from mandalorion_tpu.parallel.mesh import make_mesh


def _batch(rng, b, l):
    q = jnp.asarray(rng.integers(0, 4, size=(b, l)), jnp.int32)
    t = jnp.asarray(rng.integers(0, 4, size=(b, 128)), jnp.int32)
    return q, t


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n", [1, 2, 8])
def test_sharded_scores_match_local(n):
    rng = np.random.default_rng(3)
    mesh = make_mesh(n, ("reads",))
    q, t = _batch(rng, 8 * n, 48)
    local = _score_batch(q, t)
    sharded = sharded_batch_score(mesh, q, t)
    assert np.array_equal(np.asarray(local), np.asarray(sharded))


def test_quant_merge_psum():
    mesh = make_mesh(4, ("reads",))
    rng = np.random.default_rng(4)
    partials = jnp.asarray(rng.integers(0, 5, size=(4, 6, 3)), jnp.int32)
    merged = sharded_quant_merge(mesh, partials)
    assert np.array_equal(np.asarray(merged),
                          np.asarray(partials.sum(axis=0)))


@pytest.mark.parametrize("n", [2, 8])
def test_training_step(n):
    rng = np.random.default_rng(5)
    mesh = make_mesh(n)
    b = 8 * n
    q, t = _batch(rng, b, 32)
    iso = jnp.asarray(rng.integers(0, 10, size=(b,)), jnp.int32)
    sample = jnp.asarray(rng.integers(0, 3, size=(b,)), jnp.int32)
    scores, counts, gathered, rotated = jax.jit(
        lambda a, bb, c, d: training_step(mesh, a, bb, c, d, 10, 3))(
            q, t, iso, sample)
    assert scores.shape == (b,)
    assert int(counts.sum()) == b
    # counts match a host-side bincount
    expect = np.zeros((10, 3), np.int64)
    for i, s in zip(np.asarray(iso), np.asarray(sample)):
        expect[i, s] += 1
    assert np.array_equal(np.asarray(counts), expect)
    # ring rotation permutes shards: same multiset of rows
    assert sorted(map(tuple, np.asarray(rotated))) == \
        sorted(map(tuple, np.asarray(q)))


@pytest.mark.parametrize("n", [2, 4, 8])
def test_sharded_index_lookup_matches_local(n):
    """Hash-axis index sharding: per-device searchsorted + all_gather of
    candidate hits == GenomeIndex.lookup on the replicated index."""
    import synthdata
    from mandalorion_tpu.align.encode import encode, minimizers
    from mandalorion_tpu.align.index import build_index
    from mandalorion_tpu.parallel.dist import (
        shard_index_arrays, sharded_index_lookup)
    from mandalorion_tpu.parallel.mesh import make_mesh

    genome = {"chr1": synthdata.make_genome(60_000, seed=31),
              "chr2": synthdata.make_genome(30_000, seed=32)}
    idx = build_index(genome)
    rng = np.random.default_rng(7)
    s = int(rng.integers(0, 50_000))
    read, _ = synthdata.mutate_read(genome["chr1"][s:s + 2000], rng, 0.05)
    _pos, hashes = minimizers(encode(read), 15, 5)
    max_occ = 8

    ref_q, ref_p = idx.lookup(hashes, max_occ)

    mesh = make_mesh(n)
    axis_len = mesh.devices.shape[0]
    sh, sp, sl = shard_index_arrays(idx, axis_len)
    pos, valid = sharded_index_lookup(mesh, sh, sp, sl, hashes, max_occ)
    pos = np.asarray(pos)
    valid = np.asarray(valid)
    got_q, got_p = [], []
    for qi in range(len(hashes)):
        for d in range(pos.shape[0]):
            for k in range(max_occ):
                if valid[d, qi, k]:
                    got_q.append(qi)
                    got_p.append(int(pos[d, qi, k]))
    assert got_q == list(ref_q)
    assert got_p == list(ref_p)
