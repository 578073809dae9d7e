"""Coverage for smaller surfaces: KNN GCN backbone, predict(), event log."""
import json
import os

import numpy as np
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


@pytest.fixture(scope="module")
def data():
    d, _ = synthetic_dataset(
        n_users=70, n_items=80, n_inter=1400, cold_object="item",
        content_dim=10, seed=83,
    )
    return d


def test_knn_lightgcn_backbone(data, tmp_path):
    """KNN --backbone selects the LightGCN encoder class (KNN.py:12-15)."""
    args = default_args(
        model="KNN", dataset="synth", backbone="LightGCN", layers=2,
        epochs=1, bs=256, emb_size=8, early_stop=3,
        emb_dir=str(tmp_path), seed=5, save_emb=False, knn_num=3,
    )
    model = model_factory(Config(args, data))
    assert model.use_gcn
    model.run()
    assert all(
        np.isfinite(v) for row in model.overall_test_results for v in row
    )


def test_single_user_predict(data, tmp_path):
    args = default_args(
        model="MF", dataset="synth", epochs=1, bs=256, emb_size=8,
        early_stop=3, emb_dir=str(tmp_path), seed=5, save_emb=False,
    )
    model = model_factory(Config(args, data))
    model.run()
    raw_user = int(data.id2user[0])
    scores = model.predict(raw_user)
    assert scores.shape == (data.item_num,)
    assert np.isfinite(scores).all()
    with pytest.raises(KeyError):
        model.predict(10**7)
    raw_users = [int(data.id2user[i]) for i in (0, 1, 2)]
    batch = model.batch_predict(raw_users)
    assert batch.shape == (3, data.item_num)
    np.testing.assert_allclose(batch[0], scores, atol=1e-6)


def test_event_log_written(data, tmp_path, monkeypatch):
    log_path = str(tmp_path / "events.jsonl")
    monkeypatch.setenv("COLDREC_EVENT_LOG", log_path)
    # reset the module-level singleton so the env var takes effect
    import coldrec_tpu.utils.logging as L

    monkeypatch.setattr(L, "_global_log", None)
    args = default_args(
        model="MF", dataset="synth", epochs=2, bs=256, emb_size=8,
        early_stop=3, emb_dir=str(tmp_path), seed=5, save_emb=False,
    )
    model_factory(Config(args, data)).run()
    events = [json.loads(l) for l in open(log_path)]
    kinds = [e["event"] for e in events]
    assert "run_start" in kinds and "run_end" in kinds
    assert kinds.count("validation") == 2
    run_end = [e for e in events if e["event"] == "run_end"][0]
    assert run_end["epochs_ran"] == 2
