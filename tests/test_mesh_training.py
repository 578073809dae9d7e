"""--mesh DxM training: sharded run == single-device run (8-dev CPU mesh)."""
import jax
import numpy as np
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


@pytest.fixture(scope="module")
def data():
    # user_num/item_num multiples of 4 so TP row-sharding engages
    d, _ = synthetic_dataset(
        n_users=96, n_items=80, n_inter=1800, cold_object="item", seed=91
    )
    return d


def _run(data, mesh, model_name="MF", **kw):
    base = dict(
        model=model_name, dataset="synth", epochs=3, bs=256, emb_size=16,
        early_stop=10, seed=5, save_emb=False, mesh=mesh,
    )
    base.update(kw)
    args = default_args(**base)
    model = model_factory(Config(args, data))
    model.run()
    return model


def test_dp_matches_single_device(data):
    base = _run(data, "")
    dp = _run(data, "8x1")
    np.testing.assert_allclose(
        np.asarray(dp.user_emb), np.asarray(base.user_emb), atol=2e-5
    )
    assert dp.overall_test_results == base.overall_test_results


def test_dp_tp_matches_single_device(data):
    assert data.user_num % 4 == 0 and data.item_num % 4 == 0
    base = _run(data, "")
    tp = _run(data, "2x4")
    # tables were actually row-sharded over the model axis
    shard_shapes = {
        s.data.shape for s in tp.params["user_emb"].addressable_shards
    }
    assert (data.user_num // 4, 16) in shard_shapes
    np.testing.assert_allclose(
        np.asarray(tp.user_emb), np.asarray(base.user_emb), atol=2e-5
    )
    assert tp.overall_test_results == base.overall_test_results


def test_mesh_resume(data, tmp_path):
    """checkpoint/resume under a mesh re-applies the sharded layout."""
    ckpt = str(tmp_path / "s.ckpt")
    _run(data, "2x4", state_ckpt=ckpt, epochs=2)
    resumed = _run(data, "2x4", state_ckpt=ckpt, epochs=4)
    full = _run(data, "2x4", epochs=4)
    np.testing.assert_allclose(
        np.asarray(resumed.user_emb), np.asarray(full.user_emb), atol=2e-5
    )
    shard_shapes = {
        s.data.shape for s in resumed.params["user_emb"].addressable_shards
    }
    assert (data.user_num // 4, 16) in shard_shapes


def test_mesh_stateful_model(data, tmp_path):
    """Stateful (BatchNorm) cold model trains under a mesh; backbone first."""
    args = default_args(
        model="MF", dataset="synth", epochs=1, bs=256, emb_size=16,
        early_stop=3, seed=5, emb_dir=str(tmp_path),
    )
    model_factory(Config(args, data)).run()
    dn = _run(
        data, "4x2", model_name="DropoutNet", epochs=2,
        emb_dir=str(tmp_path),
    )
    assert np.isfinite(
        np.asarray(dn.overall_test_results, dtype=float)
    ).all()


def test_mesh_graph_model(data):
    base = _run(data, "", model_name="LightGCN", layers=2)
    dp = _run(data, "4x2", model_name="LightGCN", layers=2)
    np.testing.assert_allclose(
        np.asarray(dp.user_emb), np.asarray(base.user_emb), atol=5e-5
    )


def test_lightgcn_sharded_spmm_matches_single_device(data):
    """--mesh 2x4 routes LightGCN propagation through the mesh-sharded SpMM
    (rows+edges over the model axis); results must match the single-chip
    ELL path bit-for-bit up to reduction order."""
    base = _run(data, "", model_name="LightGCN", layers=2)
    tp = _run(data, "2x4", model_name="LightGCN", layers=2)
    np.testing.assert_allclose(
        np.asarray(tp.user_emb), np.asarray(base.user_emb), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(tp.item_emb), np.asarray(base.item_emb), atol=3e-5
    )
    assert tp.overall_test_results == base.overall_test_results


def test_cgrc_graph_cold_model_under_mesh(data):
    """CGRC (graph-reconstruction cold model) trains under --mesh with
    row-sharded user table and matches the single-device run (round-4
    VERDICT task 6: a graph cold-model on the mesh)."""
    base = _run(data, "", model_name="CGRC", epochs=2)
    tp = _run(data, "2x4", model_name="CGRC", epochs=2)
    shard_shapes = {
        s.data.shape for s in tp.params["user_emb"].addressable_shards
    }
    assert (data.user_num // 4, 16) in shard_shapes
    np.testing.assert_allclose(
        np.asarray(tp.user_emb), np.asarray(base.user_emb), atol=5e-5
    )
    assert tp.overall_test_results == base.overall_test_results


def test_xsimgcl_sharded_spmm_matches_single_device(data):
    base = _run(data, "", model_name="XSimGCL", layers=2)
    tp = _run(data, "2x4", model_name="XSimGCL", layers=2)
    np.testing.assert_allclose(
        np.asarray(tp.user_emb), np.asarray(base.user_emb), atol=5e-5
    )
    assert tp.overall_test_results == base.overall_test_results
