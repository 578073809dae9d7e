"""USIM math locked against the live PyTorch reference (model/USIM.py).

USIM's parity artifact is medium-scale only (the reference PPO loop is
CPU-bound at ml), and our rollout restructuring has documented divergences
(fixed max_time steps, compressed masks — models/usim.py docstring), so the
oracle pins the deterministic COMPONENTS with stochastic inputs injected:

  * get_reward (USIM.py:472-522): distance improvement + log-discounted
    top-10 alignment, done-gated;
  * the actor probability plane [softmax * P(continue) ∥ P(stop)]
    (USIM.py:121-130) that every sampling/log-prob path factors through;
  * get_log_probs2 (USIM.py:146-153) under an injected boolean mask plane
    built with the reference's one-hot set algebra (USIM.py:705-759) vs our
    compressed support-column form;
  * the full greedy inference rollout (USIM.py:524-549) from content to
    final state through the content mapper and done-freezing transitions.

The reference USIMCore is constructed directly (no .pt backbone on disk ->
its Xavier fallback), and its tables/actor/critic/mapper weights are copied
into our pytrees.
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
HID = 24


@pytest.fixture(scope="module")
def both(ref_env):
    import torch

    from model.USIM import USIMCore

    from coldrec_tpu.config import default_args
    from coldrec_tpu.data.synthetic import synthetic_dataset
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config

    data, _ = synthetic_dataset(
        n_users=40, n_items=60, n_inter=900, cold_object="item",
        content_dim=10, seed=13,
    )
    args = default_args(
        model="USIM", dataset="oracle_synth", epochs=1, bs=16, emb_size=D,
        seed=21, save_emb=False, usim_content_hidden=HID,
    )
    ours = model_factory(Config(args, data))

    ref_args = types.SimpleNamespace(
        emb_size=D, dataset="oracle_synth", cold_object="item",
        backbone="MF", usim_max_time=ours.max_time,
        usim_transition_rate=ours.rate, usim_k=ours.k,
        usim_reward_weight=ours.weight, usim_reward_cost=ours.reward_cost,
        usim_content_hidden=HID, actor_lr=0.0005, critic_lr=0.001,
        gamma=ours.discount,
    )
    ref_data = types.SimpleNamespace(
        user_num=data.user_num, item_num=data.item_num,
        item_content_dim=data.item_content_dim,
        mapped_item_content=np.asarray(data.item_content, np.float32),
        mapped_cold_item_idx=np.asarray(data.mapped_cold_item_idx),
    )
    torch.manual_seed(3)
    core = USIMCore(ref_args, ref_data, torch.device("cpu"))

    import jax.numpy as jnp

    def lin(mod):
        return {"w": jnp.asarray(mod.weight.detach().numpy().T),
                "b": jnp.asarray(mod.bias.detach().numpy())}

    uw = jnp.asarray(core.warm_model.user_embedding.weight[:-1].detach().numpy())
    iw = jnp.asarray(core.warm_model.item_embedding.weight.detach().numpy())
    ours.user_table = uw
    ours.item_table = iw
    ours.user_ext = jnp.concatenate([uw, jnp.zeros((1, D))], axis=0)
    ours.actor = {"map": lin(core.actor.map), "end_map": lin(core.actor.end_map)}
    ours.critic = {"fc1": lin(core.critic.fc1)}
    ours.mapper = {"fc1": lin(core.content_mapper.fc1),
                   "fc2": lin(core.content_mapper.fc2)}
    return ours, core, data


def test_reward_matches(both):
    import jax.numpy as jnp
    import torch

    ours, core, data = both
    rng = np.random.default_rng(7)
    b = 32
    item_emb = rng.standard_normal((b, D)).astype(np.float32)
    state = rng.standard_normal((b, D)).astype(np.float32)
    action = rng.integers(0, ours.n_user, b)  # stop token included
    dones = rng.random(b) < 0.3

    with torch.no_grad():
        t_r = core.get_reward(
            None, torch.tensor(item_emb), torch.tensor(state),
            torch.tensor(action), torch.tensor(dones),
        )
    j_r = ours._reward(
        jnp.asarray(item_emb), jnp.asarray(state), jnp.asarray(action),
        jnp.asarray(dones),
    )
    np.testing.assert_allclose(np.asarray(j_r), t_r.numpy(), atol=2e-5)


def test_actor_probs_plane_matches(both):
    import jax.numpy as jnp
    import torch

    from coldrec_tpu.models.usim import _probs

    ours, core, _ = both
    rng = np.random.default_rng(9)
    s = rng.standard_normal((20, D + 1)).astype(np.float32)
    with torch.no_grad():
        t_p = core.actor.state_probs(torch.tensor(s))
    j_p = _probs(ours.actor, ours.user_ext[:-1], jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(j_p), t_p.numpy(), atol=2e-5)


def test_masked_log_probs_match(both):
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    ours, core, _ = both
    rng = np.random.default_rng(11)
    b, k = 16, 5
    n_user = ours.n_user
    s = rng.standard_normal((b, D + 1)).astype(np.float32)
    pos_idx = rng.integers(0, n_user - 1, (b, k))
    user_idx = rng.integers(0, n_user - 1, (b, k))
    # force some pos∧user overlap and some empty-intersection fallback rows
    user_idx[: b // 2, 0] = pos_idx[: b // 2, 0]
    neg = rng.integers(0, n_user - 1, (b, k))
    neg_idx = np.concatenate(
        [neg, np.full((b, 1), n_user - 1)], axis=1
    )  # stop col appended (USIM.py:701)
    # argmax-exclusion column: the 20% draw keeps it, else collapses to 0
    masked_am = np.where(
        rng.random(b) > 0.8, rng.integers(0, n_user - 1, b), 0
    )

    # reference mask plane: the one-hot set algebra of USIM.py:705-759
    def oh(idx):
        return F.one_hot(torch.tensor(idx), num_classes=n_user).sum(1) >= 1

    mask = oh(pos_idx) & oh(user_idx)
    empty = mask.sum(dim=-1) == 0
    mask[empty] = oh(pos_idx)[empty]
    mask = mask | oh(neg_idx)
    mask = mask & ~(
        F.one_hot(torch.tensor(masked_am), num_classes=n_user) >= 1
    )

    idxs = (
        jnp.asarray(pos_idx), jnp.asarray(user_idx), jnp.asarray(neg_idx),
        jnp.asarray(masked_am),
    )
    cands, keep = ours._support_columns(*idxs)
    assert np.array_equal(
        np.asarray(ours._rebuild_mask(n_user, *idxs)), mask.numpy()
    ), "support-column mask disagrees with the reference one-hot algebra"
    # actions: first kept support column per row (always exists: stop col)
    first = np.argmax(np.asarray(keep), axis=1)
    actions = np.asarray(cands)[np.arange(b), first]

    with torch.no_grad():
        t_lp = core.actor.get_log_probs2(
            torch.tensor(s), torch.tensor(actions), mask.float()
        )
    j_lp = ours._log_probs_masked(
        ours.actor, jnp.asarray(s), jnp.asarray(actions), idxs
    )
    np.testing.assert_allclose(np.asarray(j_lp), t_lp.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_greedy_inference_matches(both):
    import jax.numpy as jnp
    import torch

    ours, core, data = both
    content = np.asarray(data.item_content, np.float32)[:24]
    with torch.no_grad():
        t_state, _ = core.infer(torch.tensor(content))
    j_state = ours._infer(ours.actor, jnp.asarray(content))
    np.testing.assert_allclose(
        np.asarray(j_state), t_state.numpy(), atol=2e-5
    )
