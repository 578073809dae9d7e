"""M2VAE math locked against the live PyTorch reference (model/M2VAE.py).

M2VAE's parity artifact is medium-scale only (the reference side is
CPU-expensive at ml — tools/regen_parity.sh tier 2), so this supplies the
deterministic counterpart: reference M2VAE_Learner and our M2VAE with torch
weights copied into our pytree, the four reparameterisation draws (z_a, z_c,
z_p, z — M2VAE.py:297-330) pre-drawn from OUR key-split and fed to torch via
a patched ``torch.randn_like`` pop-queue, and the FULL training loss
(kld_weight * KLD + recon_weight * recon + rank + contrast +
decouple_weight * InfoNCE, M2VAE.py:396-425) pinned at fp32, with train-mode
BatchNorm batch statistics on both sides. The cold-generation eval tables
(generate_item_emb, M2VAE.py:407-419: PoE of the two view posteriors MoPoE'd
with the item posterior, decoded under eval-mode BN) are pinned too.
"""
import os
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

D = 16
P, N = 3, 4


@pytest.fixture(scope="module")
def both(ref_env):
    import torch

    from model.M2VAE import M2VAE_Learner

    from coldrec_tpu.config import default_args
    from coldrec_tpu.data.synthetic import synthetic_dataset
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config

    data, _ = synthetic_dataset(
        n_users=40, n_items=60, n_inter=900, cold_object="item",
        content_dim=10, seed=13,
    )
    args = default_args(
        model="M2VAE", dataset="synth", epochs=1, bs=32, emb_size=D,
        seed=21, save_emb=False,
        implicit_dim=D, attr_present_dim=D, cat_implicit_dim=D,
        positive_number=P, negative_number=N,
    )
    ours = model_factory(Config(args, data))

    ref_args = types.SimpleNamespace(
        cold_object="item", m2vae_pretrain=False,
        implicit_dim=D, attr_present_dim=D, cat_implicit_dim=D,
        tau=ours.tau,
        m2vae_kld_weight=args.m2vae_kld_weight,
        m2vae_recon_weight=args.m2vae_recon_weight,
        m2vae_decouple_weight=args.m2vae_decouple_weight,
        m2vae_attr_mask_neg1=False,
    )
    ref_data = types.SimpleNamespace(
        user_num=data.user_num, item_num=data.item_num,
        mapped_item_content=data.item_content,
        mapped_cold_item_idx=data.mapped_cold_item_idx,
    )
    torch.manual_seed(3)
    ref = M2VAE_Learner(ref_args, ref_data, torch.device("cpu"))

    import jax.numpy as jnp

    def lin(mod):
        p = {"w": jnp.asarray(mod.weight.detach().numpy().T)}
        if mod.bias is not None:
            p["b"] = jnp.asarray(mod.bias.detach().numpy())
        return p

    def t(x):
        return jnp.asarray(x.detach().numpy())

    def bn_block(seq):
        # Sequential(Linear, BatchNorm1d, Tanh) -> {lin, bn} (common.py)
        return {
            "lin": lin(seq[0]),
            "bn": {"scale": t(seq[1].weight), "bias": t(seq[1].bias)},
        }

    def mlp2(seq):
        # Sequential(Linear, act, Linear[, act]) -> [lin0, lin1]
        return [lin(seq[0]), lin(seq[2])]

    ours.params = {
        "user_embedding": t(ref.user_embedding),
        "item_embedding": t(ref.item_embedding),
        "attr_matrix": t(ref.attr_matrix),
        "attr_W1": t(ref.attr_W1),
        "attr_b1": t(ref.attr_b1),
        "attr_W2": t(ref.attr_W2),
        "content_projection": {"w": t(ref.content_projection.weight).T},
        "moe_gate_a": mlp2(ref.moe_gate_a),
        "moe_gate_c": mlp2(ref.moe_gate_c),
        "user_gate_w": t(ref.user_gate_weights),
        "user_gate_b": t(ref.user_gate_bias),
        "view_gate": mlp2(ref.view_gate),
        "fc2": bn_block(ref.fc2),
        "fc3": bn_block(ref.fc3),
        "decoder": bn_block(ref.decoder),
        "mean_a_q": lin(ref.mean_encoder_a_q),
        "log_a_q": lin(ref.log_v_encoder_a_q),
        "mean_c_q": lin(ref.mean_encoder_c_q),
        "log_c_q": lin(ref.log_v_encoder_c_q),
        "mean_i": lin(ref.mean_encoder_i),
        "log_i": lin(ref.log_v_encoder_i),
        "mean_a_p": lin(ref.mean_encoder_a_p),
        "log_a_p": lin(ref.log_v_encoder_a_p),
    }
    return ref, ours, data


class _RandnQueue:
    """torch.randn_like replacement popping pre-drawn draws in call order."""

    def __init__(self, draws):
        import torch

        self._q = [torch.tensor(np.asarray(d)) for d in draws]

    def __call__(self, t, **kw):
        out = self._q.pop(0)
        assert tuple(t.shape) == tuple(out.shape), (t.shape, out.shape)
        return out


def test_full_loss_matches(both, monkeypatch):
    import jax
    import jax.numpy as jnp
    import torch

    ref, ours, data = both
    rng = np.random.default_rng(17)
    b = 24
    u = rng.integers(0, data.user_num, b)
    i = rng.integers(0, data.item_num, b)
    neg_u = rng.integers(0, data.user_num, b)
    pos_grid = rng.integers(0, data.item_num, (b, P))
    neg_grid = rng.integers(0, data.item_num, (b, P, N))

    # our loss draws z_a, z_c, z_p, z from split(key, 4) in that order
    # (m2vae.py loss_fn); the reference draws randn_like in the SAME order
    # (M2VAE.py:297,304,307,330) — pre-draw from our split, queue into torch.
    key = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    draws = [jax.random.normal(k, (b, D)) for k in (k1, k2, k3, k4)]
    monkeypatch.setattr(torch, "randn_like", _RandnQueue(draws))
    ref.train()
    t_loss = ref.loss(
        u_idx=torch.tensor(u), i_idx=torch.tensor(i),
        neg_u_idx=torch.tensor(neg_u),
        pos_i_list=torch.tensor(pos_grid),
        neg_i_list=torch.tensor(neg_grid),
    )
    monkeypatch.undo()

    batch = {
        "user": jnp.asarray(u), "pos_item": jnp.asarray(i),
        "neg_user": jnp.asarray(neg_u),
        "pos_grid": jnp.asarray(pos_grid),
        "neg_grid": jnp.asarray(neg_grid),
        "weight": jnp.ones((b,), jnp.float32),
    }
    j_loss, _ = ours.loss_fn(ours.params, ours.net_state, batch, key)
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=5e-5)


def _advance_bn(ref, data, monkeypatch):
    """One reference train-mode forward so the BN running buffers hold
    non-trivial statistics — deterministic regardless of which tests ran
    before (a -k selection of the eval test alone would otherwise compare
    under the init buffers: mean 0, var 1)."""
    import torch

    rng = np.random.default_rng(29)
    b = 24
    monkeypatch.setattr(
        torch, "randn_like",
        _RandnQueue([rng.standard_normal((b, D)).astype(np.float32)
                     for _ in range(4)]),
    )
    ref.train()
    ref.loss(
        u_idx=torch.tensor(rng.integers(0, data.user_num, b)),
        i_idx=torch.tensor(rng.integers(0, data.item_num, b)),
        neg_u_idx=torch.tensor(rng.integers(0, data.user_num, b)),
        pos_i_list=torch.tensor(rng.integers(0, data.item_num, (b, P))),
        neg_i_list=torch.tensor(rng.integers(0, data.item_num, (b, P, N))),
    )
    monkeypatch.undo()


def test_eval_tables_match(both, monkeypatch):
    import jax
    import jax.numpy as jnp
    import torch

    ref, ours, data = both
    cold = np.asarray(data.mapped_cold_item_idx)

    # advance the reference BN running stats deterministically, then sync
    # our eval state from the reference buffers so the comparison exercises
    # eval-mode BN under non-trivial statistics.
    _advance_bn(ref, data, monkeypatch)
    def bn_state(seq):
        return {
            "mean": jnp.asarray(seq[1].running_mean.detach().numpy()),
            "var": jnp.asarray(seq[1].running_var.detach().numpy()),
        }

    state = {
        "fc2": bn_state(ref.fc2), "fc3": bn_state(ref.fc3),
        "decoder": bn_state(ref.decoder),
        "eval_key": ours.net_state["eval_key"],
    }

    # ours draws the single generation eps directly from state["eval_key"]
    # (m2vae.py::_generate); feed the same draw to the reference.
    eps = jax.random.normal(state["eval_key"], (len(cold), D))
    monkeypatch.setattr(torch, "randn_like", _RandnQueue([eps]))
    ref.eval()
    with torch.no_grad():
        gen = ref.generate_item_emb(torch.tensor(cold))
        ri = ref.item_embedding.detach().clone()
        ri[torch.tensor(cold)] = gen
        ru = ref.user_embedding.detach()
    monkeypatch.undo()

    ut, it = ours.forward_tables(ours.params, state)
    np.testing.assert_allclose(np.asarray(ut), ru.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(it), ri.numpy(), atol=2e-5)
