"""Losses vs numpy oracles, including weighted-padding equivalence."""
import numpy as np
import jax.numpy as jnp

from coldrec_tpu.ops.losses import (
    batch_softmax_loss,
    bpr_loss,
    info_nce,
    l2_reg_loss,
    mse_loss,
    softplus_bpr_loss,
    triplet_loss,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_bpr_matches_oracle(rng):
    u = rng.standard_normal((16, 8)).astype(np.float32)
    p = rng.standard_normal((16, 8)).astype(np.float32)
    n = rng.standard_normal((16, 8)).astype(np.float32)
    expect = -np.log(
        1e-5 + _sigmoid((u * p).sum(1) - (u * n).sum(1))
    ).mean()
    got = float(bpr_loss(jnp.array(u), jnp.array(p), jnp.array(n)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_weighted_padding_equivalence(rng):
    """Padded batch with 0-weights == unpadded reference mean."""
    u = rng.standard_normal((10, 8)).astype(np.float32)
    p = rng.standard_normal((10, 8)).astype(np.float32)
    n = rng.standard_normal((10, 8)).astype(np.float32)
    base = float(bpr_loss(jnp.array(u), jnp.array(p), jnp.array(n)))
    pad = np.zeros((6, 8), np.float32)
    w = np.concatenate([np.ones(10), np.zeros(6)]).astype(np.float32)
    padded = float(
        bpr_loss(
            jnp.array(np.vstack([u, pad])),
            jnp.array(np.vstack([p, pad])),
            jnp.array(np.vstack([n, pad])),
            jnp.array(w),
        )
    )
    np.testing.assert_allclose(padded, base, rtol=1e-5)

    base_l2 = float(l2_reg_loss(0.01, jnp.array(u), jnp.array(p)))
    # pad rows must not contribute to the Frobenius norm
    padded_l2 = float(
        l2_reg_loss(
            0.01,
            jnp.array(np.vstack([u, rng.standard_normal((6, 8)).astype(np.float32)])),
            jnp.array(np.vstack([p, rng.standard_normal((6, 8)).astype(np.float32)])),
            weight=jnp.array(w),
        )
    )
    np.testing.assert_allclose(padded_l2, base_l2, rtol=1e-5)


def test_l2_reg_oracle(rng):
    e = rng.standard_normal((12, 4)).astype(np.float32)
    expect = 0.5 * np.linalg.norm(e) / 12
    got = float(l2_reg_loss(0.5, jnp.array(e)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_mse_triplet_softplus(rng):
    a = rng.standard_normal((8, 4)).astype(np.float32)
    b = rng.standard_normal((8, 4)).astype(np.float32)
    np.testing.assert_allclose(
        float(mse_loss(jnp.array(a), jnp.array(b))), ((a - b) ** 2).mean(), rtol=1e-5
    )
    c = rng.standard_normal((8, 4)).astype(np.float32)
    pos = ((a - b) ** 2).sum(1)
    neg = ((a - c) ** 2).sum(1)
    expect = np.maximum(pos - neg + 0.5, 0).mean()
    np.testing.assert_allclose(
        float(triplet_loss(jnp.array(a), jnp.array(b), jnp.array(c))),
        expect,
        rtol=1e-5,
    )
    ps = rng.standard_normal(8).astype(np.float32)
    ns = rng.standard_normal(8).astype(np.float32)
    expect = np.log1p(np.exp(ns - ps)).mean()
    np.testing.assert_allclose(
        float(softplus_bpr_loss(jnp.array(ps), jnp.array(ns))), expect, rtol=1e-4
    )


def test_info_nce_oracle(rng):
    v1 = rng.standard_normal((6, 4)).astype(np.float32)
    v2 = rng.standard_normal((6, 4)).astype(np.float32)
    t = 0.2
    n1 = v1 / np.linalg.norm(v1, axis=1, keepdims=True)
    n2 = v2 / np.linalg.norm(v2, axis=1, keepdims=True)
    logits = n1 @ n2.T / t
    logsm = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    expect = -np.diag(logsm).mean()
    got = float(info_nce(jnp.array(v1), jnp.array(v2), t))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_batch_softmax_loss_finite(rng):
    u = rng.standard_normal((8, 4)).astype(np.float32)
    v = rng.standard_normal((8, 4)).astype(np.float32)
    out = float(batch_softmax_loss(jnp.array(u), jnp.array(v), 0.2))
    assert np.isfinite(out)


def test_weighted_batchnorm_matches_unpadded():
    """Weighted BN stats over a padded batch == plain BN over the real rows
    (the reference never sees pad rows; torch BatchNorm1d semantics)."""
    import jax
    import jax.numpy as jnp
    from coldrec_tpu.models.common import (
        batchnorm_apply,
        batchnorm_params,
        batchnorm_state,
    )

    key = jax.random.PRNGKey(0)
    real = jax.random.normal(key, (5, 4)) * 3.0 + 1.0
    pad = jnp.tile(real[0:1], (7, 1))  # pads gather row 0's features
    x_padded = jnp.concatenate([real, pad], axis=0)
    w = jnp.concatenate([jnp.ones(5), jnp.zeros(7)])

    p, s = batchnorm_params(4), batchnorm_state(4)
    y_ref, s_ref = batchnorm_apply(p, s, real, True, momentum=0.01, eps=0.001)
    y_pad, s_pad = batchnorm_apply(
        p, s, x_padded, True, momentum=0.01, eps=0.001, weight=w
    )
    assert jnp.allclose(y_pad[:5], y_ref, atol=1e-5)
    assert jnp.allclose(s_pad["mean"], s_ref["mean"], atol=1e-6)
    assert jnp.allclose(s_pad["var"], s_ref["var"], atol=1e-5)
    # unweighted padded stats would differ
    y_bad, _ = batchnorm_apply(p, s, x_padded, True)
    assert not jnp.allclose(y_bad[:5], y_ref, atol=1e-3)
