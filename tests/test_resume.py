"""Mid-training checkpoint/resume: interrupted run == uninterrupted run."""
import numpy as np

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


def _args(seed, epochs, ckpt, **kw):
    return default_args(
        model="MF", dataset="synth", epochs=epochs, bs=256, emb_size=16,
        early_stop=10, seed=seed, save_emb=False, state_ckpt=ckpt, **kw,
    )


def test_resume_matches_uninterrupted(tmp_path):
    data, _ = synthetic_dataset(
        n_users=70, n_items=80, n_inter=1400, cold_object="item", seed=71
    )
    # uninterrupted 4-epoch run
    m_full = model_factory(Config(_args(5, 4, ""), data))
    m_full.run()

    # interrupted: run 2 epochs (checkpointing), then resume to 4
    ckpt = str(tmp_path / "state.ckpt")
    m_a = model_factory(Config(_args(5, 2, ckpt), data))
    m_a.run()
    m_b = model_factory(Config(_args(5, 4, ckpt), data))
    m_b.run()

    # identical final tables and metrics
    np.testing.assert_allclose(
        np.asarray(m_b.user_emb), np.asarray(m_full.user_emb), atol=1e-6
    )
    assert m_b.overall_test_results == m_full.overall_test_results
    assert m_b.cold_test_results == m_full.cold_test_results


def test_resume_skips_completed_training(tmp_path):
    data, _ = synthetic_dataset(
        n_users=70, n_items=80, n_inter=1400, cold_object="item", seed=71
    )
    ckpt = str(tmp_path / "state.ckpt")
    m_a = model_factory(Config(_args(5, 3, ckpt), data))
    m_a.run()
    # resuming with the same epoch budget runs zero additional epochs
    m_b = model_factory(Config(_args(5, 3, ckpt), data))
    m_b.run()
    np.testing.assert_allclose(
        np.asarray(m_b.user_emb), np.asarray(m_a.user_emb), atol=1e-6
    )
