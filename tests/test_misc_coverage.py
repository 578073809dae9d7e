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


def test_usim_chunked_inference_matches_single_call(data, tmp_path,
                                                    monkeypatch):
    """USIM's chunked greedy rollout (bounds the (cold, users) action-prob
    plane — 20 GB at book-crossing scale) must equal the one-shot path."""
    from coldrec_tpu.models.usim import USIM

    args = default_args(
        model="MF", dataset="synth", epochs=1, bs=256, emb_size=8,
        early_stop=3, emb_dir=str(tmp_path), seed=5, save_emb=True,
    )
    model_factory(Config(args, data)).run()  # backbone on the bus
    uargs = default_args(
        model="USIM", dataset="synth", epochs=0, bs=32, emb_size=8,
        early_stop=3, emb_dir=str(tmp_path), seed=5, save_emb=False,
        usim_max_time=3, usim_k=4,
    )
    usim = model_factory(Config(uargs, data))
    ue_one, ie_one = usim._eval_tables()
    monkeypatch.setattr(USIM, "_infer_blk", 4)  # force chunking + padding
    ue_chunk, ie_chunk = usim._eval_tables()
    np.testing.assert_array_equal(np.asarray(ie_one), np.asarray(ie_chunk))
    np.testing.assert_array_equal(np.asarray(ue_one), np.asarray(ue_chunk))


def test_usim_support_matches_plane(data, tmp_path):
    """The support-set masked log-prob / sampling distribution must equal
    the reference's (B, n_user) mask-plane formulation (USIM.py:668-759)
    up to summation order. The plane oracle is transcribed here from
    _rebuild_mask + the pre-support _log_probs_masked."""
    import jax
    import jax.numpy as jnp

    from coldrec_tpu.models.usim import _probs

    args = default_args(
        model="USIM", dataset="synth", epochs=0, bs=16, emb_size=8,
        early_stop=3, emb_dir=str(tmp_path), seed=3, save_emb=False,
        usim_max_time=2, usim_k=3,
    )
    usim = model_factory(Config(args, data))
    rng = np.random.default_rng(0)
    t, d, k, nu = 24, usim.emb_size, usim.k, usim.n_user
    states = jnp.asarray(rng.standard_normal((t, d + 1)).astype(np.float32))
    pos = jnp.asarray(
        np.stack([rng.choice(nu, k, replace=False) for _ in range(t)])
        .astype(np.int32))
    usr = jnp.asarray(
        np.stack([rng.choice(nu - 1, k, replace=False) for _ in range(t)])
        .astype(np.int32))
    # force overlap (non-empty pos∧user) on half the rows
    usr = usr.at[: t // 2, 0].set(pos[: t // 2, 0])
    neg = jnp.asarray(np.concatenate(
        [rng.integers(0, nu - 1, (t, k)), np.full((t, 1), nu - 1)], axis=1
    ).astype(np.int32))
    # duplicates across sets: neg col 0 repeats pos col 1
    neg = neg.at[:, 0].set(pos[:, 1])
    mam = jnp.asarray(rng.integers(0, nu, t).astype(np.int32))
    mam = mam.at[0].set(int(pos[0, 0]))  # exclusion hits a candidate
    idxs = (pos, usr, neg, mam)
    actions = pos[:, 0]  # in-support actions (plane lp finite)

    lp_support = np.asarray(
        usim._log_probs_masked(usim.actor, states, actions, idxs))
    mask = usim._rebuild_mask(nu, *idxs)
    sp = _probs(usim.actor, usim.user_ext[:-1], states)
    mp = sp * mask
    mp = mp / jnp.maximum(jnp.sum(mp, axis=-1, keepdims=True), 1e-12)
    lp_plane = np.asarray(jnp.log(jnp.maximum(
        jnp.take_along_axis(mp, actions[:, None], axis=1)[:, 0], 1e-20)))
    np.testing.assert_allclose(lp_support, lp_plane, rtol=1e-5, atol=1e-6)

    # sampling numerators: scattered support probs == plane sp*mask
    cands, keep = usim._support_columns(*idxs)
    z, lse, end = usim._z_lse(usim.actor, states)
    sp_c = usim._sp_at(cands, z, lse, end) * keep
    scattered = np.zeros((t, nu), np.float64)
    cn, sn = np.asarray(cands), np.asarray(sp_c)
    for r in range(t):
        for j in range(cn.shape[1]):
            scattered[r, cn[r, j]] += sn[r, j]
    np.testing.assert_allclose(
        scattered, np.asarray(sp * mask), rtol=1e-5, atol=1e-7)

    # an out-of-support action must floor to log(1e-20), as the plane does
    out = jnp.full((t,), int(np.asarray(mam)[0]), jnp.int32)
    lp_out = np.asarray(
        usim._log_probs_masked(usim.actor, states, out, idxs))
    assert lp_out[0] == pytest.approx(np.log(1e-20))


def test_usim_chunked_ppo_matches_dense(data, tmp_path, monkeypatch):
    """The chunked PPO optimize (bounds the (T, n_user) planes at book-
    crossing scale) must match the dense path up to sum reassociation."""
    import jax

    from coldrec_tpu.models.usim import USIM

    args = default_args(
        model="USIM", dataset="synth", epochs=0, bs=16, emb_size=8,
        early_stop=3, emb_dir=str(tmp_path), seed=7, save_emb=False,
        usim_max_time=2, usim_k=3,
    )
    usim = model_factory(Config(args, data))
    batch = next(iter(usim.batches()))
    key = jax.random.PRNGKey(11)
    call = lambda: usim._batch_step(
        usim.actor, usim.actor_state, usim.critic, usim.critic_state,
        usim.target_actor, usim.target_critic,
        np.asarray(batch["items"]), np.asarray(batch["weight"]), key,
    )
    dense = call()
    monkeypatch.setattr(USIM, "_DENSE_OPT_ELEMS", 0)  # force chunked
    chunked = call()
    for d, c in zip(jax.tree_util.tree_leaves(dense[0]),
                    jax.tree_util.tree_leaves(chunked[0])):
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(c), rtol=2e-4, atol=2e-5
        )
    for d, c in zip(jax.tree_util.tree_leaves(dense[2]),
                    jax.tree_util.tree_leaves(chunked[2])):
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(c), rtol=2e-4, atol=2e-5
        )


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


def test_usim_infer_greedy_matches_probs_plane(data, tmp_path):
    """_infer's z-row greedy argmax (no softmax plane) must follow the
    same trajectory as the direct transcription of the reference's
    argmax over [softmax(z)*end0 || end1] (USIM.py:524-549)."""
    import jax.numpy as jnp

    from coldrec_tpu.models.usim import _probs

    args = default_args(
        model="USIM", dataset="synth", epochs=0, bs=32, emb_size=8,
        early_stop=3, emb_dir=str(tmp_path), seed=3, save_emb=False,
        usim_max_time=4, usim_k=4,
    )
    usim = model_factory(Config(args, data))  # xavier backbone fallback
    content = usim.content[usim.cold_idx][:24]

    # oracle: the plane formulation, step for step
    state = usim._map_content(content)
    dones = jnp.zeros(content.shape[0], bool)
    st = jnp.full(content.shape[0], float(usim.max_time))
    for _ in range(usim.max_time):
        idx_state = jnp.concatenate([state, st[:, None]], 1)
        probs = _probs(usim.actor, usim.user_ext[:-1], idx_state)
        action = jnp.argmax(probs, axis=1)
        ue = usim.user_ext[action] * (1.0 - dones.astype(jnp.float32))[:, None]
        state = state + ue * usim.rate
        dones = dones | (action == usim.n_user - 1)
        st = st - 1

    got = usim._infer(usim.actor, content)
    np.testing.assert_allclose(np.asarray(got), np.asarray(state), atol=1e-6)


def test_usim_reward_and_sample_hoisting_equivalent(data, tmp_path):
    """The hoisted batch-invariant forms (_target_topk passed into _reward;
    topk_user passed into _sample_mask) must equal the self-computing
    forms, and _reward's gathered einsum must equal the plane + gather."""
    import jax
    import jax.numpy as jnp

    args = default_args(
        model="USIM", dataset="synth", epochs=0, bs=16, emb_size=8,
        early_stop=3, emb_dir=str(tmp_path), seed=9, save_emb=False,
        usim_max_time=2, usim_k=3,
    )
    usim = model_factory(Config(args, data))
    rng = np.random.default_rng(4)
    b = 16
    items = rng.integers(0, data.item_num, b)
    item_emb = usim.item_table[jnp.asarray(items)]
    state = jnp.asarray(rng.standard_normal((b, usim.emb_size)), jnp.float32)
    action = jnp.asarray(rng.integers(0, usim.n_user, b))
    dones = jnp.zeros(b, bool)

    tops = usim._target_topk(item_emb)
    r_hoist = usim._reward(item_emb, state, action, dones, tops)
    r_self = usim._reward(item_emb, state, action, dones)
    np.testing.assert_allclose(
        np.asarray(r_hoist), np.asarray(r_self), atol=1e-6
    )
    # plane + gather oracle for the einsum form
    top_s, idx = tops
    nxt = state + usim.user_ext[action] * usim.rate
    st_s = jnp.take_along_axis(state @ usim.user_ext.T, idx, axis=1)
    nx_s = jnp.take_along_axis(nxt @ usim.user_ext.T, idx, axis=1)
    differ = (jnp.abs(top_s - st_s) - jnp.abs(top_s - nx_s)) / jnp.log2(
        jnp.arange(top_s.shape[1]) + 2.0
    )
    sim1 = jnp.linalg.norm(item_emb - state, axis=1)
    sim2 = jnp.linalg.norm(item_emb - nxt, axis=1)
    r_plane = (
        usim.weight * (sim1 - sim2)
        + (1 - usim.weight) * jnp.mean(differ, axis=-1)
        - usim.reward_cost
    )
    np.testing.assert_allclose(
        np.asarray(r_hoist), np.asarray(r_plane), atol=1e-5
    )

    key = jax.random.PRNGKey(0)
    st_time = jnp.full(b, float(usim.max_time))
    _, tk = jax.lax.top_k(
        item_emb @ usim.user_ext[:-1].T, min(usim.k, usim.n_user - 1)
    )
    out_h = usim._sample_mask(
        state, item_emb, key, usim.actor, st_time, topk_user=tk
    )
    out_s = usim._sample_mask(state, item_emb, key, usim.actor, st_time)
    for a, b_ in zip(out_h, out_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_usim_stream_topk_matches_flat():
    """_stream_topk (scan running merge) == flat lax.top_k including the
    lowest-index tie rule, across the fall-through and scan regimes."""
    import jax
    import jax.numpy as jnp

    from coldrec_tpu.models.usim import _stream_topk

    rng = np.random.default_rng(12)
    for n, seg in [(300, 64), (1030, 64), (4096, 512)]:
        x = rng.standard_normal((17, n)).astype(np.float32)
        # force cross-segment ties
        x[:, 5] = x[:, n - 7] = x[:, n // 2] = 2.5
        x = jnp.asarray(x)
        fv, fi = jax.lax.top_k(x, 9)
        sv, si = _stream_topk(x, 9, seg=seg)
        np.testing.assert_array_equal(np.asarray(sv), np.asarray(fv))
        np.testing.assert_array_equal(np.asarray(si), np.asarray(fi))
