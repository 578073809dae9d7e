"""End-to-end: MF trains on a synthetic item-cold-start dataset and the full
run protocol (train -> early stop -> 3-way test) produces sane metrics."""
import numpy as np
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


@pytest.fixture(scope="module")
def mf_run(tmp_path_factory):
    # n_items large enough that cold/warm candidate pools both exceed
    # max_N=20, so mask leakage into the top-k tail cannot occur
    data, _ = synthetic_dataset(
        n_users=150, n_items=300, n_inter=5000, cold_object="item", seed=11
    )
    emb_dir = str(tmp_path_factory.mktemp("emb"))
    args = default_args(
        model="MF",
        dataset="synth",
        epochs=8,
        bs=512,
        emb_size=16,
        early_stop=10,
        emb_dir=emb_dir,
        seed=7,
    )
    model = model_factory(Config(args, data))
    model.run()
    return model, data, emb_dir


def test_results_recorded(mf_run):
    model, data, _ = mf_run
    for res in (
        model.overall_test_results,
        model.cold_test_results,
        model.warm_test_results,
    ):
        assert res is not None and len(res) == 2  # topN = 10,20
        for row in res:
            assert len(row) == 4
            assert all(0.0 <= v <= 1.0 for v in row)


def test_training_learns_something(mf_run):
    model, data, _ = mf_run
    # warm NDCG@20 should beat random guessing by a wide margin on this
    # easy synthetic dataset
    warm_ndcg = model.warm_test_results[1][3]
    assert warm_ndcg > 0.01


def test_cold_scores_masked_to_warm(mf_run):
    """Warm-setting rec lists never contain cold items, and vice versa."""
    model, data, _ = mf_run
    rec_warm = model.test("warm")
    cold_set = set(data.mapped_cold_item_idx.tolist())
    assert not (set(rec_warm.ravel().tolist()) & cold_set)
    rec_cold = model.test("cold")
    warm_set = set(data.mapped_warm_item_idx.tolist())
    assert not (set(rec_cold.ravel().tolist()) & warm_set)


def test_rated_items_never_recommended(mf_run):
    model, data, _ = mf_run
    rec = model.test("all")
    users = data.eval_splits["overall_test"].users
    for k in range(min(20, len(users))):
        rated = set(data.user_rated_slice(int(users[k])).tolist())
        assert not (set(rec[k].tolist()) & rated)


def test_emb_bus_written(mf_run):
    model, data, emb_dir = mf_run
    from coldrec_tpu.runtime.checkpoints import load_embeddings

    t = load_embeddings(emb_dir, "synth", "item", "MF")
    assert t["user_emb"].shape == (data.user_num, 16)
    assert t["item_emb"].shape == (data.item_num, 16)


def test_early_stop_counts(mf_run):
    model, _, _ = mf_run
    assert 1 <= model.epochs_ran <= 8
    assert model.best_performance and model.best_performance[0] <= model.epochs_ran
