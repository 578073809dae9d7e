"""Numeric equivalence of our optax optimizer builders vs torch.optim.

The reference trains VBPR/AMR/MTPR's embedding tables with
torch.optim.Adagrad at defaults (VBPR.py:18, AMR.py:18, MTPR.py:19) and
everything else with torch.optim.Adam. torch Adagrad puts eps OUTSIDE the
sqrt (g / (sqrt(acc) + 1e-10)); stock optax.adagrad puts 1e-7 inside, which
shrinks early sparse-row steps by up to ~30%. common.adagrad reimplements
the torch formula exactly — these tests pin that against live torch on the
same gradient streams, including the tiny-gradient regime where the eps
placement is the whole difference.
"""
import numpy as np
import jax.numpy as jnp
import optax
import pytest
import torch

from coldrec_tpu.models.common import adagrad, adam


def _run_pair(opt, topt_cls, grads, x0, steps_kwargs=None, **topt_kwargs):
    """Apply the same gradient sequence through optax and torch; return both."""
    x = jnp.asarray(x0)
    state = opt.init(x)
    tx = torch.tensor(np.asarray(x0), dtype=torch.float64).requires_grad_(True)
    # float64 torch reference: exposes formula mismatches, hides float noise
    topt = topt_cls([tx], **topt_kwargs)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, x)
        x = optax.apply_updates(x, updates)
        topt.zero_grad()
        tx.grad = torch.tensor(np.asarray(g), dtype=torch.float64)
        topt.step()
    return np.asarray(x), tx.detach().numpy()


@pytest.mark.parametrize("scale", [1.0, 1e-3, 1e-5])
def test_adagrad_matches_torch(scale):
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [
        (rng.normal(size=(4, 3)) * scale).astype(np.float32) for _ in range(6)
    ]
    ours, theirs = _run_pair(
        adagrad(0.01), torch.optim.Adagrad, grads, x0, lr=0.01
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_adagrad_first_step_is_full_lr():
    # torch's first Adagrad step is lr * sign(g) (denominator = |g| + eps);
    # stock optax.adagrad would give ~0.0003 * lr for g=1e-5 * ones.
    g = np.full((2, 2), 1e-5, dtype=np.float32)
    opt = adagrad(0.1)
    x = jnp.zeros((2, 2))
    updates, _ = opt.update(jnp.asarray(g), opt.init(x), x)
    np.testing.assert_allclose(np.asarray(updates), -0.1, rtol=1e-4)


def test_adagrad_zero_grad_entries_stay_put():
    g = np.zeros((2, 2), dtype=np.float32)
    opt = adagrad(0.1)
    x = jnp.ones((2, 2))
    updates, state = opt.update(jnp.asarray(g), opt.init(x), x)
    assert np.all(np.isfinite(np.asarray(updates)))
    np.testing.assert_array_equal(np.asarray(updates), 0.0)


@pytest.mark.parametrize("wd", [0.0, 1e-4])
def test_adam_matches_torch(wd):
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(5,)).astype(np.float32)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(8)]
    ours, theirs = _run_pair(
        adam(0.01, weight_decay=wd),
        torch.optim.Adam,
        grads,
        x0,
        lr=0.01,
        weight_decay=wd,
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
