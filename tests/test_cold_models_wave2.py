"""VBPR/AMR/MTPR/MetaEmbedding end-to-end tests (incl. the VBPR->AMR bus)."""
import numpy as np
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    data, _ = synthetic_dataset(
        n_users=80, n_items=100, n_inter=2000, cold_object="item",
        content_dim=10, seed=23,
    )
    emb_dir = str(tmp_path_factory.mktemp("emb"))
    args = default_args(
        model="MF", dataset="synth", epochs=2, bs=512, emb_size=16,
        early_stop=10, emb_dir=emb_dir, seed=7,
    )
    model_factory(Config(args, data)).run()
    return data, emb_dir


def _run(data, emb_dir, name, **kw):
    args = default_args(
        model=name, dataset="synth", epochs=2, bs=256, emb_size=16,
        early_stop=5, emb_dir=emb_dir, seed=5, **kw,
    )
    model = model_factory(Config(args, data))
    model.run()
    assert model.overall_test_results is not None
    assert all(np.isfinite(v) for row in model.overall_test_results for v in row)
    return model


def test_vbpr_then_amr(env):
    data, emb_dir = env
    # VBPR trains from the MF backbone and writes its 5-tensor checkpoint
    _run(data, emb_dir, "VBPR", save_emb=True)
    from coldrec_tpu.runtime.checkpoints import load_embeddings

    t = load_embeddings(
        emb_dir, "synth", "item", "VBPR",
        required=("user_emb_main_P", "item_emb_main_Q", "user_emb_aux", "W"),
    )
    assert t["W"].shape == (10, 16)
    # AMR consumes VBPR's tensors verbatim (AMR.py:94-124)
    _run(data, emb_dir, "AMR", save_emb=False)


def test_vbpr_save_survives_donation(env):
    """save() must materialize tensors: params buffers are donated (deleted)
    by the next train step (regression for a dangling-buffer crash)."""
    data, emb_dir = env
    from coldrec_tpu.data.sampler import pairwise_batches

    args = default_args(
        model="VBPR", dataset="synth", epochs=1, bs=256, emb_size=16,
        early_stop=5, emb_dir=emb_dir, seed=9, save_emb=False,
    )
    model = model_factory(Config(args, data))
    model.save()
    batch = next(pairwise_batches(data, 256, model.host_rng))
    model.params, model.opt_state, _ = model._step(
        model.params, model.opt_state, batch
    )
    tensors = model.extra_saved_tensors()  # must not raise
    assert tensors["W"].shape == (10, 16)


def test_mtpr(env):
    data, emb_dir = env
    model = _run(data, emb_dir, "MTPR", save_emb=False)
    # warm-side table is 2d wide under item cold-start
    assert model.params["P"].shape == (data.user_num, 32)
    assert model.params["Q"].shape == (data.item_num, 16)


def test_metaembedding(env):
    data, emb_dir = env
    model = _run(data, emb_dir, "MetaEmbedding", save_emb=False)
    # cold rows were patched with generated meta embeddings
    from coldrec_tpu.runtime.checkpoints import load_embeddings

    backbone = load_embeddings(emb_dir, "synth", "item", "MF")
    cold = data.mapped_cold_item_idx
    assert not np.allclose(
        np.asarray(model.item_emb)[cold], backbone["item_emb"][cold]
    )
