"""Cold-start model end-to-end tests over the MF backbone bus."""
import numpy as np
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    data, _ = synthetic_dataset(
        n_users=100, n_items=120, n_inter=2500, cold_object="item",
        content_dim=12, seed=17,
    )
    emb_dir = str(tmp_path_factory.mktemp("emb"))
    # train the MF backbone once; its checkpoint feeds the cold models
    args = default_args(
        model="MF", dataset="synth", epochs=3, bs=512, emb_size=16,
        early_stop=10, emb_dir=emb_dir, seed=7,
    )
    model_factory(Config(args, data)).run()
    return data, emb_dir


COLD_MODELS = ["DeepMusic", "DUIF", "GAR", "DropoutNet", "Heater", "KNN"]


@pytest.mark.parametrize("model_name", COLD_MODELS)
def test_cold_model_end_to_end(env, model_name):
    data, emb_dir = env
    args = default_args(
        model=model_name, dataset="synth", epochs=2, bs=256, emb_size=16,
        early_stop=5, emb_dir=emb_dir, seed=5, save_emb=False,
    )
    model = model_factory(Config(args, data))
    model.run()
    for res in (
        model.overall_test_results,
        model.cold_test_results,
        model.warm_test_results,
    ):
        assert res is not None
        assert all(np.isfinite(v) for row in res for v in row)


def test_generator_patches_cold_rows(env):
    """After training, cold rows of the eval table differ from the backbone
    (generator output), warm rows are identical (frozen backbone)."""
    data, emb_dir = env
    from coldrec_tpu.runtime.checkpoints import load_embeddings

    args = default_args(
        model="DeepMusic", dataset="synth", epochs=1, bs=256, emb_size=16,
        early_stop=5, emb_dir=emb_dir, seed=5, save_emb=False,
    )
    model = model_factory(Config(args, data))
    model.run()
    backbone = load_embeddings(emb_dir, "synth", "item", "MF")
    item_emb = np.asarray(model.item_emb)
    cold = data.mapped_cold_item_idx
    warm = data.mapped_warm_item_idx
    assert not np.allclose(item_emb[cold], backbone["item_emb"][cold])
    np.testing.assert_allclose(
        item_emb[warm], backbone["item_emb"][warm], rtol=1e-5
    )


def test_missing_backbone_raises(env):
    data, _ = env
    args = default_args(
        model="GAR", dataset="synth", emb_dir="/tmp/nonexistent_emb_dir_xyz"
    )
    with pytest.raises(FileNotFoundError):
        model_factory(Config(args, data))
