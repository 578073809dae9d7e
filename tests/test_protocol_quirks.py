"""Reference protocol quirks (SURVEY 'known quirks' list)."""
import numpy as np
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


@pytest.fixture(scope="module")
def data():
    d, _ = synthetic_dataset(
        n_users=60, n_items=70, n_inter=1200, cold_object="item", seed=121
    )
    return d


def test_eval_every_interacts_with_early_stop(data):
    """Patience decrements only on eval epochs (BaseRecommender quirk):
    with eval_every=2 and patience 2, a non-improving run trains ~2x the
    epochs of eval_every=1 before stopping."""

    def run(eval_every):
        args = default_args(
            model="MF", dataset="synth", epochs=40, bs=256, emb_size=4,
            lr=0.0,  # no learning -> NDCG never improves after epoch 1
            early_stop=2, eval_every=eval_every, seed=5, save_emb=False,
        )
        m = model_factory(Config(args, data))
        m.run()
        return m.epochs_ran

    e1 = run(1)
    e2 = run(2)
    assert e2 > e1  # fewer eval points -> later stop
    assert e1 == 3  # epoch 1 sets best; epochs 2,3 consume patience
    assert e2 == 5  # evals at 1,3,5 only


def test_early_stop_strict_improvement(data):
    """Equal NDCG consumes patience (strict > , BaseRecommender.py:306-316):
    lr=0 makes every epoch identical, so patience drains epoch by epoch."""
    args = default_args(
        model="MF", dataset="synth", epochs=50, bs=256, emb_size=4,
        lr=0.0, early_stop=5, seed=5, save_emb=False,
    )
    m = model_factory(Config(args, data))
    m.run()
    assert m.epochs_ran == 6  # 1 init + 5 patience
    assert m.best_performance[0] == 1


def test_early_stop_disabled(data):
    args = default_args(
        model="MF", dataset="synth", epochs=8, bs=256, emb_size=4,
        lr=0.0, early_stop=0, seed=5, save_emb=False,
    )
    m = model_factory(Config(args, data))
    m.run()
    assert m.epochs_ran == 8  # runs to completion


def test_seed_per_run_protocol(data):
    """runs>1 uses seed=r per run (main.py:163): run 0 differs from run 1."""
    res = []
    for r in range(2):
        args = default_args(
            model="MF", dataset="synth", epochs=2, bs=256, emb_size=8,
            seed=r, save_emb=False,
        )
        m = model_factory(Config(args, data))
        m.run()
        res.append(m.overall_test_results)
    assert res[0] != res[1]
