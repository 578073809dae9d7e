"""Shared model building blocks: initializers, MLP, train-step factory.

Models are plain parameter pytrees (dicts of jnp arrays) + pure functions;
optimization is optax. ``xavier_uniform`` matches torch's
``nn.init.xavier_uniform_`` gain-1 semantics used throughout the reference
(e.g. MF.py:73-79), so statistical parity of initial scales holds.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def xavier_uniform(key, shape, dtype=jnp.float32) -> jnp.ndarray:
    fan_in, fan_out = shape[-2], shape[-1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def normal_init(key, shape, std=0.01, dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.normal(key, shape, dtype) * std


# NOTE (round 4, measured dead end): a custom-VJP "lookup" whose backward
# is a SORTED scatter-add (indices_are_sorted=True) beats the default XLA
# scatter 3.1x in ISOLATION at BX table shapes (0.958 -> 0.310 ms for
# 12,288 rows into 270k x 64 — tools/exp_scatter_variants.py), but makes
# ZERO end-to-end difference inside the real value_and_grad + Adam train
# step (2.882 vs 2.895 ms full step; grad-only A/B overlaps within noise
# — tools/exp_mf_step_decomp.py, tools/exp_grad_sorted.py): XLA already
# schedules the autodiff scatter efficiently in context. Models therefore
# keep plain `table[ids]` gathers; revisit only if a profile shows the
# scatter dominating on future toolchains.


def linear_params(key, in_dim: int, out_dim: int, bias: bool = True) -> Dict:
    """torch nn.Linear default init: kaiming-uniform W, uniform bias."""
    kw, kb = jax.random.split(key)
    bound = float(1.0 / np.sqrt(in_dim))
    p = {
        "w": jax.random.uniform(
            kw, (in_dim, out_dim), minval=-bound, maxval=bound
        )
    }
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound)
    return p


def linear(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def mlp_params(key, dims: Sequence[int]) -> list:
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_params(k, a, b) for k, a, b in zip(keys, dims[:-1], dims[1:])]


def mlp_apply(
    params: list, x: jnp.ndarray, activation=jax.nn.relu, final_activation=None
) -> jnp.ndarray:
    """3-layer helper analog of the reference MLP (utils.py:10-22) for any depth."""
    for i, p in enumerate(params):
        x = linear(p, x)
        if i < len(params) - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x


def adam(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 term added to the gradient (not AdamW)."""
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay), optax.adam(lr)
        )
    return optax.adam(lr)


def adagrad(lr: float) -> optax.GradientTransformation:
    """torch.optim.Adagrad, exact (VBPR/AMR/MTPR embedding optimizer).

    torch computes ``g / (sqrt(sum g^2) + 1e-10)`` — eps OUTSIDE the sqrt —
    while ``optax.adagrad`` computes ``g * rsqrt(sum g^2 + 1e-7)``: for
    entries whose accumulated square is below ~1e-7 (fresh embedding rows
    in the first sparse-gradient steps) optax's step is up to ~30% smaller.
    Match torch exactly instead (defaults: lr_decay=0, eps=1e-10,
    initial_accumulator_value=0; reference usage VBPR.py:18, AMR.py:18,
    MTPR.py:19 passes none of these).
    """
    eps = 1e-10

    def init_fn(params):
        return optax.ScaleByRssState(
            sum_of_squares=jax.tree.map(jnp.zeros_like, params)
        )

    def update_fn(updates, state, params=None):
        del params
        acc = jax.tree.map(
            lambda g, s: s + jnp.square(g), updates, state.sum_of_squares
        )
        scaled = jax.tree.map(
            lambda g, s: -lr * g / (jnp.sqrt(s) + eps), updates, acc
        )
        return scaled, optax.ScaleByRssState(sum_of_squares=acc)

    return optax.GradientTransformation(init_fn, update_fn)


def make_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    donate: bool = True,
) -> Callable:
    """jit-compiled (params, opt_state, batch, *extra) -> (params, opt_state, loss).

    ``loss_fn(params, batch, *extra) -> scalar``. Params/opt_state buffers are
    donated so the big embedding tables update in place on device.
    """

    def step(params, opt_state, batch, *extra):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, *extra)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_train_step_aux(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Like make_train_step but loss_fn returns (loss, new_state) where state
    carries non-trainable buffers (BatchNorm running stats, etc.):
    ``loss_fn(params, state, batch, *extra) -> (loss, new_state)``.
    Returns jitted (params, opt_state, state, batch, *extra) ->
    (params, opt_state, state, loss)."""

    def step(params, opt_state, state, batch, *extra):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, batch, *extra
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss

    return jax.jit(step, donate_argnums=(0, 1, 2))


def truncated_normal_init(key, shape, std=0.01, dtype=jnp.float32) -> jnp.ndarray:
    """Truncated normal in (-2, 2) scaled by std (DropoutNet.py:138-144)."""
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def linear_params_tn(key, in_dim: int, out_dim: int, std=0.01) -> Dict:
    """Linear with truncated-normal weight, zero bias (DropoutNet init_weights)."""
    return {
        "w": truncated_normal_init(key, (in_dim, out_dim), std=std),
        "b": jnp.zeros((out_dim,)),
    }


@jax.jit
def _dot_score(user_emb, item_emb, users):
    return user_emb[users] @ item_emb.T


def dot_scores(user_emb: jnp.ndarray, item_emb: jnp.ndarray) -> Callable:
    """score_fn(user_ids) = U[user_ids] @ I.T.

    Tables are arguments of one module-level jitted function, so new tables
    each epoch reuse the same compiled program (a per-epoch ``jax.jit``
    closure would recompile every epoch — minutes over the TPU tunnel).
    """

    def score(users):
        return _dot_score(user_emb, item_emb, users)

    return score


def batchnorm_params(dim: int) -> Dict:
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
    }


def batchnorm_state(dim: int) -> Dict:
    return {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}


def batchnorm_apply(
    params: Dict,
    state: Dict,
    x: jnp.ndarray,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    weight: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """torch BatchNorm1d semantics incl. running-stat update in train mode.

    ``weight`` (1.0 real / 0.0 pad) makes the batch statistics match the
    reference's unpadded batches exactly — without it, heavily padded final
    batches (thousands of identical gathered rows) skew mean/var.
    """
    if training:
        if weight is not None:
            w = weight[:, None]
            n = jnp.maximum(jnp.sum(weight), 1.0)
            mean = jnp.sum(x * w, axis=0) / n
            var = jnp.sum((x - mean) ** 2 * w, axis=0) / n
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        else:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
            n = x.shape[0]
            unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) / jnp.sqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state


def dropout(key, x: jnp.ndarray, rate: float, training: bool) -> jnp.ndarray:
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
