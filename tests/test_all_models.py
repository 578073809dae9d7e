"""Every registered model runs end-to-end on a tiny item-cold-start dataset."""
import numpy as np
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import AVAILABLE_MODELS, model_factory
from coldrec_tpu.runtime.trainer import Config

ALL_MODELS = list(AVAILABLE_MODELS.keys())

# per-model overrides to keep the tiny run fast
SMALL = {
    "CLCRec": dict(num_neg=6),
    "CCFCRec": dict(positive_number=2, negative_number=3, self_neg_number=3),
    "M2VAE": dict(
        positive_number=2, negative_number=3,
        implicit_dim=8, attr_present_dim=8, cat_implicit_dim=8,
    ),
    "USIM": dict(usim_max_time=3, usim_k=4, bs=32),
    "AGNN": dict(agnn_knn_k=4),
    "FSGNN": dict(fsgnn_ppr_iter=4, fsgnn_knn_k=4, fsgnn_sc_max_edges=64),
    "CGRC": dict(cgrc_le_max_edges=64, cgrc_ranking_neg_per_user=4),
    "NCL": dict(num_clusters=4),
    "GoRec": dict(pre_cluster_num=4),
}

# AMR depends on VBPR's checkpoint; ordering matters
ORDERED = [m for m in ALL_MODELS if m not in ("AMR",)] + ["AMR"]


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    data, _ = synthetic_dataset(
        n_users=60, n_items=70, n_inter=1400, cold_object="item",
        content_dim=10, seed=43,
    )
    emb_dir = str(tmp_path_factory.mktemp("emb"))
    return data, emb_dir


def test_registry_lists_26_models():
    assert len(ALL_MODELS) == 26


@pytest.mark.parametrize("model_name", ORDERED)
def test_model_end_to_end(env, model_name):
    data, emb_dir = env
    kw = dict(
        model=model_name, dataset="synth", epochs=1, bs=128, emb_size=8,
        early_stop=3, emb_dir=emb_dir, seed=5,
        # the warm backbones save to the bus so dependents can load them
        save_emb=model_name in ("MF", "VBPR"),
    )
    kw.update(SMALL.get(model_name, {}))
    model = model_factory(Config(default_args(**kw), data))
    model.run()
    for res in (
        model.overall_test_results,
        model.cold_test_results,
        model.warm_test_results,
    ):
        assert res is not None
        assert all(np.isfinite(v) for row in res for v in row), model_name
