"""User cold-start path: the cold_object='user' branch of the protocol.

The masking protocol differs (no candidate item masks, BaseRecommender.py:
130-143 only masks for cold_object=='item'); generators patch USER rows.
"""
import numpy as np
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config

USER_COLD_MODELS = [
    "MF", "DeepMusic", "DUIF", "GAR", "DropoutNet", "Heater",
    "MetaEmbedding", "KNN", "LARA", "GoRec", "VBPR",
]


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    data, _ = synthetic_dataset(
        n_users=100, n_items=80, n_inter=2000, cold_object="user",
        content_dim=10, seed=53,
    )
    emb_dir = str(tmp_path_factory.mktemp("emb"))
    args = default_args(
        model="MF", dataset="synthu", epochs=2, bs=512, emb_size=16,
        cold_object="user", early_stop=10, emb_dir=emb_dir, seed=7,
    )
    model_factory(Config(args, data)).run()
    return data, emb_dir


def test_user_content_loaded(env):
    data, _ = env
    assert data.user_content is not None
    assert data.item_content is None
    assert data.candidate_mask("user", "warm") is None


@pytest.mark.parametrize("model_name", USER_COLD_MODELS)
def test_user_cold_end_to_end(env, model_name):
    data, emb_dir = env
    args = default_args(
        model=model_name, dataset="synthu", epochs=1, bs=256, emb_size=16,
        cold_object="user", early_stop=3, emb_dir=emb_dir, seed=5,
        save_emb=model_name in ("MF", "VBPR"),
    )
    model = model_factory(Config(args, data))
    model.run()
    for res in (
        model.overall_test_results,
        model.cold_test_results,
        model.warm_test_results,
    ):
        assert res is not None
        assert all(np.isfinite(v) for row in res for v in row), model_name


def test_user_cold_generator_patches_user_rows(env):
    data, emb_dir = env
    from coldrec_tpu.runtime.checkpoints import load_embeddings

    args = default_args(
        model="DeepMusic", dataset="synthu", epochs=1, bs=256, emb_size=16,
        cold_object="user", early_stop=3, emb_dir=emb_dir, seed=5,
        save_emb=False,
    )
    model = model_factory(Config(args, data))
    model.run()
    backbone = load_embeddings(emb_dir, "synthu", "user", "MF")
    cold = data.mapped_cold_user_idx
    warm = data.mapped_warm_user_idx
    got = np.asarray(model.user_emb)
    assert not np.allclose(got[cold], backbone["user_emb"][cold])
    np.testing.assert_allclose(got[warm], backbone["user_emb"][warm], rtol=1e-5)
