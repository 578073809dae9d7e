"""LARA / CLCRec / ALDI end-to-end tests + ALDI-specific semantics."""
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
        content_dim=10, seed=29,
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
        model=name, dataset="synth", epochs=2, bs=128, emb_size=16,
        early_stop=5, emb_dir=emb_dir, seed=5, save_emb=False, **kw,
    )
    model = model_factory(Config(args, data))
    model.run()
    assert model.overall_test_results is not None
    assert all(np.isfinite(v) for row in model.overall_test_results for v in row)
    return model


def test_lara(env):
    data, emb_dir = env
    _run(data, emb_dir, "LARA")


def test_clcrec(env):
    data, emb_dir = env
    _run(data, emb_dir, "CLCRec", num_neg=8)


def test_clcrec_rejects_user_cold(env):
    data, emb_dir = env
    args = default_args(model="CLCRec", cold_object="user", emb_dir=emb_dir)
    with pytest.raises(ValueError):
        model_factory(Config(args, data))


def test_aldi(env):
    data, emb_dir = env
    model = _run(data, emb_dir, "ALDI", tws=1)
    # dual-table scoring: un-classified items (neither warm nor cold) get 0
    scores = np.asarray(model.batch_scores(np.array([0, 1], dtype=np.int32)))
    classified = set(data.mapped_warm_item_idx.tolist()) | set(
        data.mapped_cold_item_idx.tolist()
    )
    unclassified = [i for i in range(data.item_num) if i not in classified]
    if unclassified:
        np.testing.assert_allclose(scores[:, unclassified], 0.0, atol=1e-6)


def test_aldi_item_frequency(env):
    data, _ = env
    from coldrec_tpu.models.aldi import aldi_item_frequency

    freq = aldi_item_frequency(data)
    # oracle for a few items
    tp = data.train_pairs
    for item in np.unique(tp[:, 1])[:5]:
        users = tp[tp[:, 1] == item, 0]
        expect = sum(
            1.0 / max(len(data.user_rated_slice(int(u))), 1) for u in users
        )
        np.testing.assert_allclose(freq[item], expect, rtol=1e-5)
