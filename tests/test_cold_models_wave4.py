"""GoRec / CCFCRec end-to-end tests."""
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
        content_dim=10, seed=37,
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


def test_gorec(env):
    data, emb_dir = env
    model = _run(data, emb_dir, "GoRec", pre_cluster_num=5)
    assert model.cluster_label.shape == (data.item_num,)


def test_ccfcrec_scratch(env):
    data, emb_dir = env
    _run(
        data, emb_dir, "CCFCRec",
        positive_number=3, negative_number=4, self_neg_number=4,
    )


def test_ccfcrec_pretrained_frozen(env):
    data, emb_dir = env
    model = _run(
        data, emb_dir, "CCFCRec", pretrain=True, pretrain_update=False,
        positive_number=2, negative_number=3, self_neg_number=3,
    )
    # frozen backbone: user embedding unchanged after training
    from coldrec_tpu.runtime.checkpoints import load_embeddings

    backbone = load_embeddings(emb_dir, "synth", "item", "MF")
    np.testing.assert_allclose(
        np.asarray(model.params["user_embedding"]),
        backbone["user_emb"],
        rtol=1e-6,
    )


def test_ccfcrec_sampler_invariants(env):
    data, _ = env
    from coldrec_tpu.data.sampler import ccfcrec_batches, warm_item_pool

    rng = np.random.default_rng(0)
    pool = set(warm_item_pool(data).tolist())
    batch = next(ccfcrec_batches(data, 64, rng, 3, 4, 4))
    n_real = int(batch["weight"].sum())
    for k in range(min(10, n_real)):
        u = batch["user"][k]
        rated = set(data.user_rated_slice(int(u)).tolist())
        # positives come from the user's rated items
        assert set(batch["pos_grid"][k].tolist()) <= rated
        # negative grids avoid rated items and stay in the warm pool
        negs = set(batch["neg_grid"][k].ravel().tolist())
        assert not (negs & rated)
        assert negs <= pool
        assert not (set(batch["self_negs"][k].tolist()) & rated)
