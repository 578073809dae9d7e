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


@pytest.mark.parametrize("mode", ["gather", "exchange", "auto"])
def test_sharded_lookup(mesh, rng, mode):
    table = rng.standard_normal((64, 16)).astype(np.float32)
    ids = rng.integers(0, 64, 32).astype(np.int32)
    sharded = shard_rows(mesh, jnp.asarray(table))
    got = np.asarray(sharded_lookup(mesh, sharded, jnp.asarray(ids), mode))
    np.testing.assert_allclose(got, table[ids], rtol=1e-6)


def test_exchange_lookup_gradients(mesh, rng):
    """Grad through the id-exchange lookup == dense one-hot scatter-add."""
    table = rng.standard_normal((64, 16)).astype(np.float32)
    ids = rng.integers(0, 64, 32).astype(np.int32)
    cot = rng.standard_normal((32, 16)).astype(np.float32)

    def loss(t, mode):
        rows = sharded_lookup(mesh, t, jnp.asarray(ids), mode)
        return jnp.sum(rows * cot)

    g_ex = np.asarray(jax.grad(lambda t: loss(t, "exchange"))(
        shard_rows(mesh, jnp.asarray(table))))
    expect = np.zeros_like(table)
    np.add.at(expect, ids, cot)
    np.testing.assert_allclose(g_ex, expect, rtol=1e-5, atol=1e-6)


def _collective_bytes(mesh, n_rows, batch, mode):
    """Sum of collective operand bytes in the lowered HLO of one lookup."""
    import re

    table = jnp.zeros((n_rows, 16), jnp.float32)
    ids = jnp.zeros((batch,), jnp.int32)
    lowered = jax.jit(
        lambda t, i: sharded_lookup(mesh, t, i, mode)
    ).lower(jax.device_put(
        table, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(AXIS_MODEL, None))), ids)
    text = lowered.as_text()
    total = 0
    for op in ("all_reduce", "all_gather", "all_to_all"):
        # region ops (all_reduce) carry their type on the closing line;
        # search forward from each occurrence for the first result type
        for m in re.finditer(rf'"stablehlo\.{op}"', text):
            t = re.search(r"-> tensor<([0-9x]+)xf32>", text[m.end():])
            if t:
                dims = [int(d) for d in t.group(1).split("x")]
                total += 4 * int(np.prod(dims))
    return total


def test_exchange_lookup_comm_scales_with_batch_not_table(mesh):
    """VERDICT r1 task 4: per-step wire bytes must be O(B*d), flat in N."""
    small = _collective_bytes(mesh, 64, 32, "exchange")
    big = _collective_bytes(mesh, 4096, 32, "exchange")
    assert small == big > 0, (small, big)
    # the all-gather path by contrast scales with the table height
    g_small = _collective_bytes(mesh, 64, 32, "gather")
    g_big = _collective_bytes(mesh, 4096, 32, "gather")
    assert g_big >= 32 * g_small > 0, (g_small, g_big)
    # auto picks exchange once the table dwarfs the batch
    assert _collective_bytes(mesh, 4096, 32, "auto") == big


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


def test_sharded_retrieval_topk_matches_masked_topk(mesh, rng):
    """Kernel-backed item-axis-sharded retrieval (interpret mode) must
    equal the single-chip masked_topk oracle, including rated rejection."""
    from coldrec_tpu.parallel.ops import sharded_retrieval_topk
    from coldrec_tpu.runtime.eval import masked_topk

    b, n_items, d, k, r = 24, 8 * 128, 16, 6, 8
    u = rng.standard_normal((b, d)).astype(np.float32)
    items = rng.standard_normal((n_items, d)).astype(np.float32)
    rated = np.full((b, r), n_items, dtype=np.int32)
    for i in range(b):
        nr = rng.integers(0, r)
        rated[i, :nr] = rng.choice(n_items, nr, replace=False)
    excluded = np.zeros(n_items, bool)
    excluded[rng.choice(n_items, n_items // 5, replace=False)] = True

    item_sharded = shard_rows(mesh, jnp.asarray(items))
    excl_sharded = jax.device_put(
        jnp.asarray(excluded),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(AXIS_MODEL)
        ),
    )
    vals, ids = sharded_retrieval_topk(
        mesh, jnp.asarray(u), item_sharded, rated, excl_sharded, k,
        tile_u=8, block_i=128, interpret=True,
    )
    ref_vals, ref_ids = masked_topk(
        jnp.asarray(u @ items.T), jnp.asarray(rated),
        jnp.asarray(excluded), k,
    )
    np.testing.assert_allclose(vals, np.asarray(ref_vals), rtol=1e-4, atol=1e-4)
    scores = u @ items.T
    np.testing.assert_allclose(
        np.take_along_axis(scores, ids, axis=1),
        np.take_along_axis(scores, np.asarray(ref_ids), axis=1),
        rtol=1e-4, atol=1e-4,
    )
    for i in range(b):
        got = set(ids[i].tolist())
        assert not (got & set(rated[i][rated[i] < n_items].tolist()))
        assert not (got & set(np.where(excluded)[0].tolist()))


def test_sharded_retrieval_lane_collision_fallback(mesh, rng):
    """Planted same-lane-class top set overflows the per-lane list in one
    shard; the sharded ghost must flag it and the per-shard overfetch
    fallback must return the exact set."""
    from coldrec_tpu.ops.pallas.retrieval import SLOTS
    from coldrec_tpu.parallel.ops import sharded_retrieval_topk

    n_items, d = 8 * 256, 8
    k = SLOTS + 4
    n_plant = SLOTS + 2
    u = np.zeros((8, d), dtype=np.float32)
    u[:, 0] = 1.0
    items = rng.standard_normal((n_items, d)).astype(np.float32) * 0.01
    plant = [iid for iid in range(0, n_plant * 128, 128)]  # one shard,
    # one lane class
    for rank, iid in enumerate(plant):
        items[iid] = 0.0
        items[iid, 0] = 100.0 - rank
    rated = np.full((8, 4), n_items, dtype=np.int32)
    excluded = np.zeros(n_items, bool)
    item_sharded = shard_rows(mesh, jnp.asarray(items))
    excl_sharded = jax.device_put(
        jnp.asarray(excluded),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(AXIS_MODEL)
        ),
    )
    vals, ids = sharded_retrieval_topk(
        mesh, jnp.asarray(u), item_sharded, rated, excl_sharded, k,
        tile_u=8, block_i=128, interpret=True,
    )
    assert set(ids[0, :n_plant].tolist()) == set(plant)


def test_sharded_retrieval_pad_ids_never_alias_real_items(mesh, rng):
    """Per-shard pad columns must map to the global pad id n_items, not
    offset into the NEXT shard's real id range: with a candidate pool
    thinner than k, the filler ranks would otherwise surface concrete
    wrong item ids. items_per (96) deliberately not a lane multiple so
    every shard carries pad columns."""
    from coldrec_tpu.parallel.ops import sharded_retrieval_topk

    n_items, d, k = 8 * 96, 8, 5
    b = 8
    u = rng.standard_normal((b, d)).astype(np.float32)
    items = rng.standard_normal((n_items, d)).astype(np.float32)
    rated = np.full((b, 4), n_items, dtype=np.int32)
    excluded = np.ones(n_items, bool)
    keep = rng.choice(n_items, 2, replace=False)
    excluded[keep] = False  # only 2 valid candidates < k
    item_sharded = shard_rows(mesh, jnp.asarray(items))
    excl_sharded = jax.device_put(
        jnp.asarray(excluded),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(AXIS_MODEL)
        ),
    )
    vals, ids = sharded_retrieval_topk(
        mesh, jnp.asarray(u), item_sharded, rated, excl_sharded, k,
        tile_u=8, block_i=128, interpret=True,
    )
    scores = u @ items.T
    for i in range(b):
        for rank in range(k):
            iid = int(ids[i, rank])
            if iid < n_items:
                # any real id returned must carry its true score (possibly
                # NEG-masked) — an aliased pad id would mismatch
                expect = scores[i, iid] if not excluded[iid] else -10e8
                assert abs(float(vals[i, rank]) - expect) < 1e-3, (
                    i, rank, iid, float(vals[i, rank]), expect
                )
        # the two real candidates must occupy the top ranks
        assert set(ids[i, :2].tolist()) == set(keep.tolist())


def test_pad_rows():
    x = np.ones((10, 3), np.float32)
    out = pad_rows(x, 4)
    assert out.shape == (12, 3)
    assert (out[10:] == 0).all()
