"""SimGCL/XSimGCL/NCL smoke + semantics tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


@pytest.fixture(scope="module")
def data():
    d, _ = synthetic_dataset(
        n_users=60, n_items=50, n_inter=1200, cold_object="item", seed=31
    )
    return d


def test_unique_padded_and_masked_infonce(rng):
    from coldrec_tpu.ops.losses import info_nce, info_nce_masked, unique_padded

    ids = jnp.array([3, 1, 3, 2, 0, 0], dtype=jnp.int32)
    w = jnp.array([1, 1, 1, 1, 0, 0], dtype=jnp.float32)  # last 2 padded
    vals, mask = unique_padded(ids, w, 6, 100)
    real = sorted(np.asarray(vals)[np.asarray(mask) > 0].tolist())
    assert real == [1, 2, 3]
    # masked InfoNCE on padded uniques == plain InfoNCE on the dense uniques
    emb1 = jnp.asarray(rng.standard_normal((101, 8)).astype(np.float32))
    emb2 = jnp.asarray(rng.standard_normal((101, 8)).astype(np.float32))
    got = float(info_nce_masked(emb1[vals], emb2[vals], mask, 0.2))
    dense = jnp.array([1, 2, 3], dtype=jnp.int32)
    expect = float(info_nce(emb1[dense], emb2[dense], 0.2))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_kmeans_clusters(rng):
    from coldrec_tpu.ops.kmeans import kmeans

    # two well-separated blobs -> assignment must separate them
    a = rng.standard_normal((50, 4)).astype(np.float32) + 10
    b = rng.standard_normal((50, 4)).astype(np.float32) - 10
    x = jnp.asarray(np.vstack([a, b]))
    _, assign = kmeans(jax.random.PRNGKey(0), x, 2, n_iters=10)
    assign = np.asarray(assign)
    assert len(set(assign[:50])) == 1
    assert len(set(assign[50:])) == 1
    assert assign[0] != assign[-1]


def test_simgcl_layer_mean_excludes_ego(data, rng):
    """SimGCL averages layers 1..L only (SimGCL.py:110-111)."""
    from coldrec_tpu.models.simgcl import simgcl_forward
    from coldrec_tpu.ops.spmm import SparseGraph, spmm

    graph = SparseGraph.from_host(data.norm_adj)
    ue = jnp.asarray(rng.standard_normal((data.user_num, 8)).astype(np.float32))
    ie = jnp.asarray(rng.standard_normal((data.item_num, 8)).astype(np.float32))
    u_out, i_out = simgcl_forward(graph, ue, ie, 2, 0.1, key=None)
    e0 = jnp.concatenate([ue, ie], axis=0)
    e1 = spmm(graph, e0)
    e2 = spmm(graph, e1)
    mean = (e1 + e2) / 2
    np.testing.assert_allclose(
        np.asarray(u_out), np.asarray(mean[: data.user_num]), rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("model_name", ["SimGCL", "XSimGCL"])
def test_contrastive_end_to_end(data, model_name, tmp_path):
    args = default_args(
        model=model_name,
        dataset="synth",
        epochs=2,
        bs=256,
        emb_size=16,
        layers=2,
        early_stop=5,
        emb_dir=str(tmp_path),
        seed=3,
    )
    model = model_factory(Config(args, data))
    model.run()
    assert model.overall_test_results is not None
    assert all(np.isfinite(v) for row in model.overall_test_results for v in row)


def test_ncl_end_to_end_with_proto(data, tmp_path, monkeypatch):
    # shrink the warm-up threshold so the proto path runs in 3 epochs
    import coldrec_tpu.models.ncl as ncl_mod

    monkeypatch.setattr(ncl_mod, "WARMUP_EPOCHS", 1)
    args = default_args(
        model="NCL",
        dataset="synth",
        epochs=3,
        bs=256,
        emb_size=16,
        layers=2,
        hyper_layers=1,
        num_clusters=5,
        early_stop=5,
        emb_dir=str(tmp_path),
        seed=3,
    )
    model = model_factory(Config(args, data))
    model.run()
    assert model.overall_test_results is not None
    assert all(np.isfinite(v) for row in model.overall_test_results for v in row)


def test_ncl_constraint(data):
    args = default_args(model="NCL", layers=2, hyper_layers=2)
    with pytest.raises(ValueError):
        model_factory(Config(args, data))
