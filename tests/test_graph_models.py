"""SpMM correctness + LightGCN/NGCF end-to-end smoke."""
import numpy as np
import jax.numpy as jnp
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.ops.spmm import SparseGraph, spmm, spmm_ref
from coldrec_tpu.runtime.trainer import Config


@pytest.fixture(scope="module")
def data():
    d, _ = synthetic_dataset(
        n_users=80, n_items=60, n_inter=1500, cold_object="item", seed=21
    )
    return d


def test_spmm_matches_scipy(data, rng):
    host = data.norm_adj
    x = rng.standard_normal((host.shape[1], 8)).astype(np.float32)
    got = np.asarray(spmm(SparseGraph.from_host(host), jnp.array(x)))
    expect = spmm_ref(host, x)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_ell_spmm_matches_scipy(data, rng):
    """Hybrid ELL + symmetric-VJP path == scipy, incl. the gradient."""
    import jax
    from coldrec_tpu.ops.spmm import build_ell, make_sym_spmm

    host = data.norm_adj
    x = rng.standard_normal((host.shape[1], 8)).astype(np.float32)
    f = make_sym_spmm(host)
    got = np.asarray(f(jnp.array(x)))
    expect = spmm_ref(host, x)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)
    # tail actually exercised (95th percentile cut leaves heavy rows)
    ell = build_ell(host)
    assert ell.tail_rows.shape[0] > 0
    # symmetric custom VJP == autodiff through the segment-sum path
    g_sym = jax.grad(lambda x: float(0) + jnp.sum(f(x) ** 2))(jnp.array(x))
    g_ref = jax.grad(
        lambda x: jnp.sum(spmm(SparseGraph.from_host(host), x) ** 2)
    )(jnp.array(x))
    np.testing.assert_allclose(
        np.asarray(g_sym), np.asarray(g_ref), rtol=1e-3, atol=1e-4
    )


def test_lightgcn_propagation_matches_dense(data, rng):
    from coldrec_tpu.models.lightgcn import lightgcn_propagate
    import scipy.sparse as sp

    host = data.norm_adj
    adj = sp.coo_matrix((host.vals, (host.rows, host.cols)), shape=host.shape)
    d = 8
    ue = rng.standard_normal((data.user_num, d)).astype(np.float32)
    ie = rng.standard_normal((data.item_num, d)).astype(np.float32)
    graph = SparseGraph.from_host(host)
    u_out, i_out = lightgcn_propagate(graph, jnp.array(ue), jnp.array(ie), 2)
    # dense oracle: mean of [E0, A E0, A^2 E0]
    e0 = np.vstack([ue, ie])
    e1 = adj @ e0
    e2 = adj @ e1
    mean = (e0 + e1 + e2) / 3
    np.testing.assert_allclose(
        np.asarray(u_out), mean[: data.user_num], rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(i_out), mean[data.user_num :], rtol=1e-3, atol=1e-5
    )


@pytest.mark.parametrize("model_name", ["LightGCN", "NGCF"])
def test_graph_backbone_end_to_end(data, model_name, tmp_path):
    args = default_args(
        model=model_name,
        dataset="synth",
        epochs=2,
        bs=512,
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


def test_cgrc_chunked_paths_match_dense():
    """The lax.scan running-LSE and running-top-k paths are exact: forcing
    them (tiny _DENSE_ELEMS_CAP) must reproduce the dense L_E terms and the
    dense per-cold-item top-k users."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from coldrec_tpu.config import default_args
    from coldrec_tpu.data.synthetic import synthetic_dataset
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config

    data, _ = synthetic_dataset(
        n_users=50, n_items=60, n_inter=900, cold_object="item",
        content_dim=8, seed=7,
    )
    args = default_args(
        model="CGRC", dataset="synth", epochs=0, bs=64, emb_size=8,
        cgrc_le_max_edges=32, cgrc_mlp_hidden=8,
    )
    m = model_factory(Config(args, data))
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    cold_mask = (
        jax.random.uniform(k1, (data.item_num,)) < 0.4
    ) & m._eligible
    x_all = m._item_x(m.params)
    tp = data.train_pairs
    eidx = np.asarray(
        jax.random.randint(k2, (m.le_max,), 0, tp.shape[0])
    )
    e_u = jnp.asarray(tp[eidx, 0].astype(np.int32))
    e_i = jnp.asarray(tp[eidx, 1].astype(np.int32))
    h_e = m.params["user_emb"][e_u]

    dense = m._edge_softmax_terms(m.params, h_e, e_u, e_i, x_all, cold_mask)
    m._DENSE_ELEMS_CAP = 1  # force scan paths
    chunk = m._edge_softmax_terms(m.params, h_e, e_u, e_i, x_all, cold_mask)
    assert np.allclose(dense[0], chunk[0], atol=1e-5)  # pos logits
    hv = np.asarray(dense[2])
    assert np.array_equal(hv, np.asarray(chunk[2]))
    assert np.allclose(
        np.asarray(dense[1])[hv], np.asarray(chunk[1])[hv], atol=1e-4
    )

    # top-k users per cold item
    h_u_bar = m.params["user_emb"]
    cold = np.asarray(data.mapped_cold_item_idx)
    x_cold = x_all[jnp.asarray(cold)]
    k = min(5, data.user_num)
    logits = m._edge_logits(m.params, h_u_bar, x_cold)
    _, dense_top = jax.lax.top_k(logits.T, k)
    chunk_top = m._topk_users_chunked(m.params, h_u_bar, x_cold, k)
    # compare score SETS (ties may reorder indices)
    ds = np.take_along_axis(
        np.asarray(logits.T), np.asarray(dense_top), axis=1
    )
    cs = np.take_along_axis(np.asarray(logits.T), chunk_top, axis=1)
    assert np.allclose(np.sort(ds, 1), np.sort(cs, 1), atol=1e-5)
