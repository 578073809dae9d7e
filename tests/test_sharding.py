"""Sharded == replicated equivalence on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.ops.spmm import SparseGraph, spmm
from coldrec_tpu.parallel.mesh import AXIS_MODEL, make_mesh
from coldrec_tpu.parallel.ops import (
    ShardedGraph,
    pad_rows,
    shard_rows,
    sharded_lookup,
    sharded_masked_topk,
    sharded_spmm,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(2, 4)


def test_sharded_lookup(mesh, rng):
    table = rng.standard_normal((64, 16)).astype(np.float32)
    ids = rng.integers(0, 64, 32).astype(np.int32)
    sharded = shard_rows(mesh, jnp.asarray(table))
    got = np.asarray(sharded_lookup(mesh, sharded, jnp.asarray(ids)))
    np.testing.assert_allclose(got, table[ids], rtol=1e-6)


def test_sharded_spmm_matches_single_chip(mesh):
    data, _ = synthetic_dataset(n_users=50, n_items=40, n_inter=900, seed=3)
    host = data.norm_adj
    n = host.shape[0]
    n_pad = ((n + 3) // 4) * 4
    x = np.random.default_rng(0).standard_normal((n_pad, 8)).astype(np.float32)
    # single-chip reference
    ref = np.asarray(
        spmm(SparseGraph.from_host(host), jnp.asarray(x[:n]))
    )
    sg = ShardedGraph(mesh, host, n_pad)
    x_sharded = shard_rows(mesh, jnp.asarray(x))
    out = np.asarray(sharded_spmm(sg, x_sharded))
    np.testing.assert_allclose(out[:n], ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[n:], 0.0, atol=1e-6)


def test_sharded_topk_matches_single_chip(mesh, rng):
    b, n_items, d, k = 16, 64, 8, 5
    u = rng.standard_normal((b, d)).astype(np.float32)
    items = rng.standard_normal((n_items, d)).astype(np.float32)
    excluded = np.zeros(n_items, bool)
    excluded[rng.choice(n_items, 10, replace=False)] = True
    item_sharded = shard_rows(mesh, jnp.asarray(items))
    excl_sharded = jax.device_put(
        jnp.asarray(excluded),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(AXIS_MODEL)),
    )
    vals, ids = sharded_masked_topk(
        mesh, jnp.asarray(u), item_sharded, excl_sharded, k
    )
    scores = u @ items.T
    scores[:, excluded] = -10e8
    ref_ids = np.argsort(-scores, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(scores, ref_ids, axis=1),
        rtol=1e-4,
    )


def test_pad_rows():
    x = np.ones((10, 3), np.float32)
    out = pad_rows(x, 4)
    assert out.shape == (12, 3)
    assert (out[10:] == 0).all()
