"""--fused_steps K (lax.scan-fused train steps) == the per-batch loop.

The fused path must be a pure dispatch optimization: same batches, same
order, same optimizer updates, same PRNG key sequence — so final tables,
validation trajectory, and early-stop behavior are identical. Covers the
plain path (MF), the rng-threaded path (XSimGCL), and a tail group that
doesn't divide K.
"""
import numpy as np
import pytest

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


@pytest.fixture(scope="module")
def data():
    d, _ = synthetic_dataset(
        n_users=80, n_items=100, n_inter=2600, cold_object="item", seed=9
    )
    return d


def _run(data, model_name, fused_steps, **kw):
    args = default_args(
        model=model_name, dataset="synth", epochs=3, bs=256, emb_size=16,
        early_stop=5, seed=11, save_emb=False, fused_steps=fused_steps, **kw
    )
    m = model_factory(Config(args, data))
    m.run()
    return m


@pytest.mark.parametrize("model_name", ["MF", "XSimGCL"])
def test_fused_matches_per_batch(data, model_name):
    base = _run(data, model_name, 0)
    # bs=256 over ~1.6k train pairs -> ~7 batches/epoch: K=3 leaves a tail
    fused = _run(data, model_name, 3)
    np.testing.assert_allclose(
        np.asarray(base.user_emb), np.asarray(fused.user_emb),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(base.item_emb), np.asarray(fused.item_emb),
        rtol=1e-5, atol=1e-6,
    )
    assert base.overall_test_results == fused.overall_test_results
    assert base.cold_test_results == fused.cold_test_results


def test_fused_k_larger_than_epoch(data):
    """K bigger than the whole epoch: everything lands in the tail-group
    per-batch path; still equivalent."""
    base = _run(data, "MF", 0)
    fused = _run(data, "MF", 999)
    np.testing.assert_allclose(
        np.asarray(base.user_emb), np.asarray(fused.user_emb),
        rtol=1e-5, atol=1e-6,
    )
    assert base.overall_test_results == fused.overall_test_results


def test_custom_optimizer_models_ignore_fused_flag(data):
    """Models with bespoke optimizer structures (VBPR: torch-exact Adagrad
    on tables + Adam on W, two update streams) must keep the per-batch
    loop even when --fused_steps is passed — the fused scan replays the
    DEFAULT loss_fn+optimizer step, which is not their step."""
    import tempfile
    emb_dir = tempfile.mkdtemp()
    bb = default_args(model="MF", dataset="synth", epochs=2, bs=256,
                      emb_size=16, early_stop=5, emb_dir=emb_dir, seed=3)
    model_factory(Config(bb, data)).run()
    args = default_args(model="VBPR", dataset="synth", epochs=1, bs=256,
                        emb_size=16, early_stop=5, emb_dir=emb_dir, seed=5,
                        save_emb=False, fused_steps=8)
    m = model_factory(Config(args, data))
    assert m._use_fused() == 0  # gated off by _fused_ok
    m.run()  # and the run still completes through the per-batch loop
    assert m.overall_test_results is not None
