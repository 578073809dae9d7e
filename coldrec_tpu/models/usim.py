"""USIM RL embedding refinement (reference: model/USIM.py). Item-only.

A content-mapped initial state is nudged toward the (frozen) backbone item
embedding by a discrete actor that picks warm users (+ an appended stop
token): ``s += u * rate`` (USIM.py:551-570). Reward = distance-to-item
improvement + top-10 score alignment with log discount (473-522). PPO-clip
with target nets, 5 inner epochs (350-409); per batch the buffer is filled
by 3 rollouts and cleared (844-857) — so optimization always consumes the
current batch's transitions. Masked action sampling combines
positive-direction top-k ∧ item-score top-k, random negatives, the stop
token, and the 20% argmax-exclusion trick (668-759, quirks preserved —
including the argmax index collapsing to user 0 when not selected).
Inference = greedy rollout from the content state (524-549); scoring uses
the frozen backbone user table with warm/cold item columns (594-600,
unclassified items score 0).

TPU-native restructuring (SURVEY §7 hard part b): rollout + optimize are ONE
jitted program per batch — rollouts unrolled over max_time (static), the
replay "buffer" is a stack of per-step transition arrays, and masks are
stored compressed (sample indices) and rebuilt by one-hot scatter inside the
PPO step. The reference appends steps only until all envs are done; here all
max_time steps always run (done envs contribute zero-reward frozen-state
transitions — documented divergence).

The content_mapper matches the reference exactly in that it is NEVER
optimized (no optimizer covers it, USIM.py:295-300) — frozen at init.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax

from .cold_base import ColdStartModelBase
from .common import adam, linear, linear_params

REWARD_TOPK = 10  # hardcoded in the reference (USIM.py:495,504)


def _stream_topk(x, k: int, seg: int = 4096):
    """Exact top-k over a wide trailing axis as a lax.scan running merge.

    Inside USIM's UNROLLED rollout (3 x max_time python steps in one jit)
    both a flat wide ``lax.top_k`` and the eval path's reshape-based
    hierarchical form materialize multi-GB sort temps per step — XLA kept
    several alive at once and OOM'd HBM at the XING shape (4096 x 107k
    planes, s32[4096,27,4096] sort temps x3). The scan keeps one
    (B, seg) slice + a (B, 2k) merge live at a time; stability gives
    torch.topk's lowest-index tie rule (earlier segments concat first).
    Small widths fall through to the flat form unchanged."""
    b, n = x.shape
    if n <= 2 * seg:
        return jax.lax.top_k(x, min(k, n))
    pad = (-n) % seg
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((b, pad), -3.4e38, x.dtype)], axis=1
        )
    s = x.shape[1] // seg

    def body(carry, i):
        cv, ci = carry
        chunk = jax.lax.dynamic_slice_in_dim(x, i * seg, seg, axis=1)
        v, idx = jax.lax.top_k(chunk, k)
        mv = jnp.concatenate([cv, v], axis=1)
        mi = jnp.concatenate([ci, idx + i * seg], axis=1)
        nv, pos = jax.lax.top_k(mv, k)
        return (nv, jnp.take_along_axis(mi, pos, axis=1)), None

    init = (
        jnp.full((b, k), -jnp.inf, x.dtype),
        jnp.zeros((b, k), jnp.int32),
    )
    (tv, ti), _ = jax.lax.scan(body, init, jnp.arange(s))
    return tv, ti


def _probs(actor, table, state):
    """[softmax(map(s) @ users.T) * P(continue) ∥ P(stop)] (USIM.py:75-88)."""
    emb = linear(actor["map"], state)
    end = jax.nn.softmax(linear(actor["end_map"], state), axis=-1)
    ap = jax.nn.softmax(emb @ table.T, axis=-1)
    return jnp.concatenate([ap * end[:, :1], end[:, 1:2]], axis=-1)


class USIM(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        if self.args.cold_object != "item":
            raise ValueError("USIM only supports item cold-start")
        d = self.emb_size
        self.content = self.cold_side_content
        try:
            backbone = self.load_backbone()
            uw, iw = backbone["user_emb"], backbone["item_emb"]
        except FileNotFoundError:
            print("USIM: backbone not found — Xavier init fallback")
            from .common import xavier_uniform

            k1, k2 = jax.random.split(self.next_key())
            uw = xavier_uniform(k1, (self.data.user_num, d))
            iw = xavier_uniform(k2, (self.data.item_num, d))
        self.user_table = uw  # (U, d), frozen; stop token = zero row appended
        self.item_table = iw
        self.user_ext = jnp.concatenate([uw, jnp.zeros((1, d))], axis=0)
        self.n_user = int(self.user_ext.shape[0])  # U + 1 (stop)

        self.max_time = int(self.args.usim_max_time)
        self.rate = float(self.args.usim_transition_rate)
        self.k = int(self.args.usim_k)
        self.weight = float(self.args.usim_reward_weight)
        self.reward_cost = float(self.args.usim_reward_cost)
        self.discount = float(self.args.gamma)
        # PPO gradient passes per batch (reference USIM.py:431: `for _ in
        # range(5)`); an attribute so the phase profiler can re-jit with
        # n_ppo=1 and isolate the per-iteration cost (tools/usim_roofline.py)
        self.n_ppo = 5

        hid = int(self.args.usim_content_hidden)
        keys = jax.random.split(self.next_key(), 4)
        self.actor = {
            "map": linear_params(keys[0], d + 1, d),
            "end_map": linear_params(keys[1], d + 1, 2),
        }
        self.critic = {"fc1": linear_params(keys[2], d + 1, 1)}
        self.target_actor = jax.tree_util.tree_map(lambda x: x, self.actor)
        self.target_critic = jax.tree_util.tree_map(lambda x: x, self.critic)
        self.mapper = {
            "fc1": linear_params(keys[3], self.content_dim, hid),
            "fc2": linear_params(jax.random.fold_in(keys[3], 1), hid, d),
        }
        self.actor_opt = adam(
            float(self.args.actor_lr),
            weight_decay=float(self.args.usim_actor_weight_decay),
        )
        self.critic_opt = adam(
            float(self.args.critic_lr),
            weight_decay=float(self.args.usim_critic_weight_decay),
        )
        self.actor_state = self.actor_opt.init(self.actor)
        self.critic_state = self.critic_opt.init(self.critic)

        # warm/cold masks for dual-column scoring (USIM.py:594-600)
        warm = np.zeros(self.data.item_num, np.float32)
        warm[self.data.mapped_warm_item_idx] = 1.0
        cold = np.zeros(self.data.item_num, np.float32)
        cold[self.data.mapped_cold_item_idx] = 1.0
        self._col_mask = jnp.asarray(np.maximum(warm, cold))

        self._train_step = jax.jit(self._batch_step)
        self._infer_jit = jax.jit(self._infer)
        self.params = {}  # trainer contract; RL nets managed above
        self.user_emb, self.item_emb = self._eval_tables()
        self.best_user_emb, self.best_item_emb = self.user_emb, self.item_emb
        self._score_fn = None

    # ------------------------------------------------------------- RL core
    def _map_content(self, content):
        return linear(
            self.mapper["fc2"], jax.nn.relu(linear(self.mapper["fc1"], content))
        )

    def _target_topk(self, item_emb):
        """Reward's target alignment columns (USIM.py:473-522) — a function
        of item_emb ONLY, so callers compute it once per batch instead of
        once per rollout step (BX profile: a (B, 92k) plane + a 92k-wide
        top_k per step, x 3 rollouts x max_time)."""
        target_score = item_emb @ self.user_ext.T
        # streaming scan merge: flat wide top_k's sort temps are multi-GB
        # per call at BX/XING widths (see _stream_topk)
        return _stream_topk(target_score, REWARD_TOPK)

    def _reward(self, item_emb, state, action, dones, tops=None):
        sim1 = jnp.linalg.norm(item_emb - state, axis=1)
        user_emb = self.user_ext[action]
        nxt = state + user_emb * self.rate
        sim2 = jnp.linalg.norm(item_emb - nxt, axis=1)
        top_s, idx = self._target_topk(item_emb) if tops is None else tops
        # score the state against ONLY the REWARD_TOPK selected user
        # columns: a (B, K, d) gathered einsum replaces the (B, n_user)
        # plane + take_along_axis (BX: 92k-wide planes -> 10-wide)
        user_sel = self.user_ext[idx]
        st_s = jnp.einsum("bd,bkd->bk", state, user_sel)
        nx_s = jnp.einsum("bd,bkd->bk", nxt, user_sel)
        differ = jnp.abs(top_s - st_s) - jnp.abs(top_s - nx_s)
        discount = jnp.log2(jnp.arange(REWARD_TOPK) + 2.0)
        differ = differ / discount
        r1 = self.weight * (sim1 - sim2) + (1 - self.weight) * jnp.mean(
            differ, axis=-1
        )
        return (r1 - self.reward_cost) * (1.0 - dones.astype(jnp.float32))

    def _z_lse(self, actor, states):
        """Actor logits row + its logsumexp and the [continue, stop] head.

        sp (the reference's masked-sampling distribution numerator,
        USIM.py:75-88) factorizes as sp[u] = end0 * exp(z_u - lse(z)) for
        user columns and sp[stop] = end1 — so any computation that touches
        sp at only a few columns needs just this full-row reduction, never
        the (B, n_user) softmax plane."""
        emb = linear(actor["map"], states)
        end = jax.nn.softmax(linear(actor["end_map"], states), axis=-1)
        z = emb @ self.user_ext[:-1].T  # (B, n_user-1)
        lse = jax.nn.logsumexp(z, axis=1)
        return z, lse, end

    def _sp_at(self, cands, z, lse, end):
        """sp gathered at the candidate columns (stop column = end1)."""
        is_stop = cands == self.n_user - 1
        safe = jnp.where(is_stop, 0, cands)
        z_c = jnp.take_along_axis(z, safe, axis=1)
        return jnp.where(
            is_stop, end[:, 1:2], end[:, :1] * jnp.exp(z_c - lse[:, None])
        )

    def _support_columns(self, pos_idx, user_idx, neg_idx, masked_am):
        """Candidate-set form of the reference mask (USIM.py:668-759).

        The mask plane's support is always a subset of pos_idx ∪ neg_idx
        (pos∧user ⊆ pos; the empty fallback re-selects pos), so instead of
        (B, n_user) bool planes we return the concatenated candidate
        columns plus a keep flag with plane (set) semantics: a column
        survives iff its id is mask-selected, is not the excluded argmax,
        and no EARLIER kept column holds the same id (so each id counts
        once in any sum over the support — OR-dedup)."""
        in_user = jnp.any(
            pos_idx[:, :, None] == user_idx[:, None, :], axis=-1
        )
        empty = ~jnp.any(in_user, axis=-1, keepdims=True)
        w = jnp.concatenate(
            [in_user | empty, jnp.ones(neg_idx.shape, bool)], axis=1
        )
        cands = jnp.concatenate([pos_idx, neg_idx], axis=1)
        c = cands.shape[1]
        eq = cands[:, :, None] == cands[:, None, :]  # [b, j, i]
        lower = jnp.tril(jnp.ones((c, c), bool), -1)
        dup = jnp.any(eq & lower[None] & w[:, None, :], axis=-1)
        keep = w & ~dup & (cands != masked_am[:, None])
        return cands, keep

    def _sample_mask(self, state, item_emb, key, target_actor, state_time,
                     topk_user=None):
        """Masked exploration distribution (USIM.py:668-759). Returns
        (action, pos_idx, user_idx, neg_idx, masked_argmax).

        ``topk_user`` (a function of item_emb only) is hoisted out of the
        rollout time loop by _batch_step; computed here when absent.

        Sampling runs over the ≤2k+1 support columns (categorical is
        renormalization-invariant, so the distribution is identical to
        the reference's full-width masked softmax); the argmax for the
        20%-exclusion quirk comes from the z row directly (user columns
        are monotone in z; ties keep the earlier index, as argmax does).
        This removes every (B, n_user) mask/softmax plane from the
        rollout — at book-crossing scale those planes made the sampler
        ~4x the cost of the scoring matmuls themselves."""
        k1, k2, k3 = jax.random.split(key, 3)
        b = state.shape[0]
        dvec = item_emb - state
        norms = jnp.maximum(
            jnp.linalg.norm(self.user_ext, axis=-1, keepdims=True), 1e-12
        )
        norm_mat = self.user_ext / norms
        dn = dvec / jnp.maximum(
            jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-12
        )
        sim = dn @ norm_mat.T  # (B, n_user)
        if topk_user is None:
            state_score = item_emb @ self.user_ext[:-1].T
            _, topk_user = _stream_topk(
                state_score, min(self.k, self.n_user - 1)
            )
        # per rollout STEP and 92k-107k wide at BX/XING — streaming merge
        _, pos_idx = _stream_topk(sim, min(self.k, self.n_user))
        neg = jax.random.randint(k1, (b, self.k), 0, self.n_user - 1)
        stop_col = jnp.full((b, 1), self.n_user - 1, neg.dtype)
        neg_idx = jnp.concatenate([neg, stop_col], axis=1)

        index_state = jnp.concatenate([state, state_time[:, None]], axis=1)
        z, lse, end = self._z_lse(target_actor, index_state)
        # argmax of sp: user columns first (ties -> earlier), stop last
        zmax = jnp.max(z, axis=1)
        best_user = end[:, 0] * jnp.exp(zmax - lse)
        am = jnp.where(
            best_user >= end[:, 1], jnp.argmax(z, axis=1), self.n_user - 1
        )
        rand = jax.random.uniform(k2, (b,)) > 0.8
        masked_am = jnp.where(rand, am, 0)  # reference quirk: collapses to 0
        cands, keep = self._support_columns(
            pos_idx, topk_user, neg_idx, masked_am
        )
        sp_c = self._sp_at(cands, z, lse, end)
        logits = jnp.log(jnp.maximum(sp_c * keep, 1e-20))
        col = jax.random.categorical(k3, logits)
        action = jnp.take_along_axis(cands, col[:, None], axis=1)[:, 0]
        return action, pos_idx, topk_user, neg_idx, masked_am

    @staticmethod
    def _rebuild_mask(n_user, pos_idx, user_idx, neg_idx, masked_am):
        """(T, n_user) bool mask plane — the direct transcription of the
        reference's mask algebra. NOT on the production path (the support
        -set form below avoids the plane, which is 8-32 GB at
        book-crossing T); kept as the oracle for the equivalence test."""
        t = pos_idx.shape[0]
        rows = jnp.arange(t, dtype=jnp.int32)[:, None]

        def onehot_any(idx):
            return jnp.zeros((t, n_user), bool).at[rows, idx].set(True)

        oh_pos = onehot_any(pos_idx)
        mask = oh_pos & onehot_any(user_idx)
        empty = jnp.sum(mask, axis=-1) == 0
        mask = jnp.where(empty[:, None], oh_pos, mask)
        mask = mask | onehot_any(neg_idx)
        return mask & ~onehot_any(masked_am[:, None])

    def _log_probs_masked(self, actor, states, actions, idxs):
        """log of the renormalized masked policy at the taken action.

        lp = log(sp[a] / Σ_support sp) — the Σ runs over the ≤2k+1 kept
        candidate columns (set semantics via _support_columns) instead of
        a (T, n_user) mask plane; sp[a] comes from the z row + lse. Equal
        to the plane formulation up to summation order (tested in
        test_misc_coverage.py::test_usim_support_matches_plane)."""
        pos_idx, user_idx, neg_idx, masked_am = idxs
        z, lse, end = self._z_lse(actor, states)
        cands, keep = self._support_columns(
            pos_idx, user_idx, neg_idx, masked_am
        )
        sp_c = self._sp_at(cands, z, lse, end)
        sigma = jnp.sum(sp_c * keep, axis=1)
        a_stop = actions == self.n_user - 1
        za = jnp.take_along_axis(
            z, jnp.where(a_stop, 0, actions)[:, None], axis=1
        )[:, 0]
        sp_a = jnp.where(a_stop, end[:, 1], end[:, 0] * jnp.exp(za - lse))
        kept_a = jnp.any((cands == actions[:, None]) & keep, axis=1)
        sp_a = sp_a * kept_a  # mask[a]=0 -> lp = log(1e-20), as the plane
        return jnp.log(
            jnp.maximum(sp_a / jnp.maximum(sigma, 1e-12), 1e-20)
        )

    def _batch_step(
        self, actor, a_state, critic, c_state, target_actor, target_critic,
        items, valid, key,
    ):
        """One jitted USIM batch: 3 rollouts -> PPO(5) -> termination step."""
        item_emb = self.item_table[items]
        content = self.content[items]
        # batch-invariant planes hoisted out of the 3 x max_time rollout
        # steps: both depend on item_emb only (the (B, n_user) planes and
        # their 92k-wide top_ks dominated the BX rollout cost)
        _, topk_user = _stream_topk(
            item_emb @ self.user_ext[:-1].T, min(self.k, self.n_user - 1)
        )
        tops = self._target_topk(item_emb)
        # Rollouts as NESTED lax.scan (outer: 3 rollouts, inner: max_time
        # steps), NOT python unrolling. Round-5 roofline
        # (tools/usim_roofline.py, tools/USIM_ROOFLINE.json): the unrolled
        # 21-step program averaged 182 ms/step at BX scale while the
        # IDENTICAL step inside a scan runs 42.8 ms (~80% of its measured
        # matmul+stream-topk floor) — XLA schedules the one-step body far
        # better than the 21x-unrolled graph. The RNG key threading
        # reproduces the unrolled loop exactly (one discarded split per
        # rollout, one split per step), so sampling streams are unchanged.
        state0 = jax.lax.stop_gradient(self._map_content(content))

        def time_step(carry, _):
            state, dones, state_time, key = carry
            key, sk = jax.random.split(key)
            action, pos_i, user_i, neg_i, mam = self._sample_mask(
                state, item_emb, sk, target_actor, state_time,
                topk_user=topk_user,
            )
            reward = self._reward(item_emb, state, action, dones, tops)
            ue = self.user_ext[action] * (
                1.0 - dones.astype(jnp.float32))[:, None]
            next_state = state + ue * self.rate
            new_dones = dones | (action == self.n_user - 1)
            idx_state = jnp.concatenate([state, state_time[:, None]], 1)
            idx_next = jnp.concatenate(
                [next_state, (state_time - 1)[:, None]], 1
            )
            out = (idx_state, action, reward, idx_next, new_dones, pos_i,
                   user_i, neg_i, mam, valid)
            return (next_state, new_dones, state_time - 1, key), out

        def rollout(key, _):
            key, _sub = jax.random.split(key)  # unrolled loop's per-r split
            init = (
                state0,
                jnp.zeros(items.shape[0], bool),
                jnp.full(items.shape[0], float(self.max_time)),
                key,
            )
            (_, _, _, key), outs = jax.lax.scan(
                time_step, init, None, length=self.max_time
            )
            return key, outs

        key, trans = jax.lax.scan(rollout, key, None, length=3)
        # leaves are (3, max_time, B, ...) in the same rollout-major,
        # step-major order the unrolled concatenate produced
        stack = lambda i: trans[i].reshape(
            (-1,) + trans[i].shape[3:]) if trans[i].ndim > 3 else \
            trans[i].reshape(-1)
        b_state = stack(0)
        b_action = stack(1)
        b_reward = stack(2)
        b_next = stack(3)
        b_dones = stack(4).astype(jnp.float32)
        b_idx = (stack(5), stack(6), stack(7), stack(8))  # mask index sets
        b_w = stack(9)

        def critic_of(c, s):
            return linear(c["fc1"], s)[:, 0]

        w_sum = jnp.maximum(jnp.sum(b_w), 1.0)
        t_total = b_state.shape[0]
        if t_total * self.n_user <= self._DENSE_OPT_ELEMS:
            opt = self._optimize_dense
        else:
            # book-crossing scale: a dense (T, n_user) mask/prob plane is
            # 8-32 GB (T = 3*max_time*bs transitions x 92k+1 users) and
            # OOMs the chip; process transitions in bs-sized chunks —
            # sums over transitions decompose exactly, one optimizer
            # update per PPO iteration either way
            opt = self._optimize_chunked
        actor, a_state, critic, c_state = opt(
            actor, a_state, critic, c_state, target_actor, target_critic,
            critic_of, b_state, b_action, b_reward, b_next, b_dones,
            b_idx, b_w, w_sum, items.shape[0],
        )

        # termination-state critic regression (USIM.py:449-455)
        key, sk = jax.random.split(key)
        rand_t = jax.random.randint(
            sk, (items.shape[0],), 0, self.max_time
        ).astype(jnp.float32)
        term_state = jnp.concatenate([item_emb, rand_t[:, None]], 1)

        def term_loss_fn(c):
            q = critic_of(c, term_state)
            return jnp.sum(q**2 * valid) / jnp.maximum(jnp.sum(valid), 1.0)

        gc = jax.grad(term_loss_fn)(critic)
        upd, c_state = self.critic_opt.update(gc, c_state, critic)
        critic = optax.apply_updates(critic, upd)
        # hard update
        return actor, a_state, critic, c_state, actor, critic

    # ---------------------------------------------------------- optimizers
    _DENSE_OPT_ELEMS = 1 << 29  # T * n_user fp32 elements (~2 GB planes)

    def _optimize_dense(
        self, actor, a_state, critic, c_state, target_actor, target_critic,
        critic_of, b_state, b_action, b_reward, b_next, b_dones,
        b_idx, b_w, w_sum, chunk,
    ):
        """PPO(5) over the full transition set (small/medium item spaces)."""
        target_lp = self._log_probs_masked(
            target_actor, b_state, b_action, b_idx
        )
        target_q = b_reward + self.discount * critic_of(
            target_critic, b_next
        ) * (1 - b_dones)
        advantage = target_q - critic_of(target_critic, b_state)
        target_lp = jax.lax.stop_gradient(target_lp)
        target_q = jax.lax.stop_gradient(target_q)
        advantage = jax.lax.stop_gradient(advantage)

        def ppo_iter(carry, _):
            actor, a_state, critic, c_state = carry

            def actor_loss_fn(a):
                lp = self._log_probs_masked(a, b_state, b_action, b_idx)
                ratio = jnp.exp(lp - target_lp)
                surr1 = ratio * advantage
                surr2 = jnp.clip(ratio, 0.8, 1.2) * advantage
                return jnp.sum(-jnp.minimum(surr1, surr2) * b_w) / w_sum

            def critic_loss_fn(c):
                q = critic_of(c, b_state)
                return jnp.sum((q - target_q) ** 2 * b_w) / w_sum

            ga = jax.grad(actor_loss_fn)(actor)
            upd, a_state = self.actor_opt.update(ga, a_state, actor)
            actor = optax.apply_updates(actor, upd)
            gc = jax.grad(critic_loss_fn)(critic)
            upd, c_state = self.critic_opt.update(gc, c_state, critic)
            critic = optax.apply_updates(critic, upd)
            return (actor, a_state, critic, c_state), None

        (actor, a_state, critic, c_state), _ = jax.lax.scan(
            ppo_iter, (actor, a_state, critic, c_state), None, length=self.n_ppo
        )
        return actor, a_state, critic, c_state

    def _optimize_chunked(
        self, actor, a_state, critic, c_state, target_actor, target_critic,
        critic_of, b_state, b_action, b_reward, b_next, b_dones,
        b_idx, b_w, w_sum, chunk,
    ):
        """Same PPO math with transitions processed in fixed chunks: the
        (chunk, n_user) mask/prob planes are rebuilt per step inside a
        lax.scan and gradients accumulated before ONE optimizer update per
        PPO iteration — bit-identical up to sum reassociation. T is always
        a multiple of the rollout batch (T = 3 * max_time * bs)."""
        t_total = b_state.shape[0]
        n_chunks = t_total // chunk

        def rs(x):
            return x.reshape((n_chunks, chunk) + x.shape[1:])

        xs = (
            rs(b_state), rs(b_action), rs(b_reward), rs(b_next),
            rs(b_dones), tuple(rs(i) for i in b_idx), rs(b_w),
        )

        def tgt_body(_, x):
            s, a, r, nx, dn, idxs, _w = x
            lp = self._log_probs_masked(target_actor, s, a, idxs)
            q = r + self.discount * critic_of(target_critic, nx) * (1 - dn)
            adv = q - critic_of(target_critic, s)
            return None, (lp, q, adv)

        _, (c_tlp, c_tq, c_adv) = jax.lax.scan(tgt_body, None, xs)
        c_tlp = jax.lax.stop_gradient(c_tlp)
        c_tq = jax.lax.stop_gradient(c_tq)
        c_adv = jax.lax.stop_gradient(c_adv)
        xs_full = xs + (c_tlp, c_tq, c_adv)

        def ppo_iter(carry, _):
            actor, a_state, critic, c_state = carry

            def chunk_losses(a, c, x):
                s, act, _r, _nx, _dn, idxs, w, tlp, tq, adv = x
                lp = self._log_probs_masked(a, s, act, idxs)
                ratio = jnp.exp(lp - tlp)
                surr1 = ratio * adv
                surr2 = jnp.clip(ratio, 0.8, 1.2) * adv
                la = jnp.sum(-jnp.minimum(surr1, surr2) * w) / w_sum
                q = critic_of(c, s)
                lc = jnp.sum((q - tq) ** 2 * w) / w_sum
                return la, lc

            def accum(g, x):
                ga_c = jax.grad(lambda a: chunk_losses(a, critic, x)[0])(actor)
                gc_c = jax.grad(lambda c: chunk_losses(actor, c, x)[1])(critic)
                return (
                    jax.tree_util.tree_map(jnp.add, g[0], ga_c),
                    jax.tree_util.tree_map(jnp.add, g[1], gc_c),
                ), None

            zeros = (
                jax.tree_util.tree_map(jnp.zeros_like, actor),
                jax.tree_util.tree_map(jnp.zeros_like, critic),
            )
            (ga, gc), _ = jax.lax.scan(accum, zeros, xs_full)
            upd, a_state = self.actor_opt.update(ga, a_state, actor)
            actor = optax.apply_updates(actor, upd)
            upd, c_state = self.critic_opt.update(gc, c_state, critic)
            critic = optax.apply_updates(critic, upd)
            return (actor, a_state, critic, c_state), None

        (actor, a_state, critic, c_state), _ = jax.lax.scan(
            ppo_iter, (actor, a_state, critic, c_state), None, length=self.n_ppo
        )
        return actor, a_state, critic, c_state

    # ------------------------------------------------------------- rollouts
    def _infer(self, actor, content):
        """Greedy rollout -> final states (USIM.py:524-549).

        argmax([softmax(z) * end0 ∥ end1]) never needs the softmax PLANE:
        within the user columns softmax is strictly monotone in z (same
        argmax, same first-index tie rule), and the stop column wins only
        when end1 > end0 * exp(zmax - lse) — the _sample_mask `am`
        formulation. Drops 3 elementwise passes over the (B, n_user)
        plane per step (exp/sum/div), which at BX scale (92k users) made
        the per-epoch cold-item inference HBM-bound.
        Equivalence: tests/test_misc_coverage.py::test_usim_infer_greedy
        pins this against the _probs-plane argmax oracle."""
        state = self._map_content(content)
        dones = jnp.zeros(content.shape[0], bool)
        state_time = jnp.full(content.shape[0], float(self.max_time))
        for _ in range(self.max_time):
            idx_state = jnp.concatenate([state, state_time[:, None]], 1)
            z, lse, end = self._z_lse(actor, idx_state)
            best_user = end[:, 0] * jnp.exp(jnp.max(z, axis=1) - lse)
            action = jnp.where(
                best_user >= end[:, 1], jnp.argmax(z, axis=1),
                self.n_user - 1,
            )
            ue = self.user_ext[action] * (1.0 - dones.astype(jnp.float32))[:, None]
            state = state + ue * self.rate
            dones = dones | (action == self.n_user - 1)
            state_time = state_time - 1
        return state

    # ---------------------------------------------------------------- train
    def batches(self):
        """One row per warm item with train interactions (USIM.py:791-818)."""
        items = np.unique(self.data.train_pairs[:, 1])
        self.host_rng.shuffle(items)
        bs = self.batch_size
        for start in range(0, items.shape[0], bs):
            chunk = items[start : start + bs]
            n = chunk.shape[0]
            out_items = np.zeros(bs, np.int32)
            out_items[:n] = chunk
            w = np.zeros(bs, np.float32)
            w[:n] = 1.0
            yield {"items": out_items, "weight": w}

    def train(self):
        self.timer(start=True)
        epoch = -1
        for epoch in range(self.max_epoch):
            for n, batch in enumerate(self.batches()):
                (
                    self.actor,
                    self.actor_state,
                    self.critic,
                    self.critic_state,
                    self.target_actor,
                    self.target_critic,
                ) = self._train_step(
                    self.actor,
                    self.actor_state,
                    self.critic,
                    self.critic_state,
                    self.target_actor,
                    self.target_critic,
                    jnp.asarray(batch["items"]),
                    jnp.asarray(batch["weight"]),
                    self.next_key(),
                )
                if n % 10 == 0:
                    print(f"USIM training: epoch {epoch + 1} batch {n}")
            self.user_emb, self.item_emb = self._eval_tables()
            self._score_fn = None
            if epoch % self.eval_every == 0:
                self.fast_evaluation(epoch, valid_type="all")
                if self.should_stop():
                    break
        self.epochs_ran = (epoch + 1) if self.max_epoch > 0 else 0
        self.timer(start=False)
        self.user_emb, self.item_emb = self.best_user_emb, self.best_item_emb
        self._score_fn = None
        if self.args.save_emb:
            from ..runtime.checkpoints import save_embeddings

            save_embeddings(
                self.args.emb_dir, self.dataset_name, self.args.cold_object,
                self.model_name,
                {
                    "user_emb": np.asarray(self.user_emb),
                    "item_emb": np.asarray(self.item_emb),
                },
                fmt=getattr(self.args, "save_emb_format", "npz"),
            )

    _infer_blk = 4096  # rollout chunk width (class attr for tests)

    def _eval_tables(self):
        cold = self.cold_idx
        blk = self._infer_blk
        if cold.shape[0] <= blk:
            gen = self._infer_jit(self.actor, self.content[cold])
        else:
            # chunk the greedy rollout: one (n_cold, n_user) action-prob
            # plane is 20 GB at book-crossing scale (54k cold x 92k
            # users) and OOMs the chip; fixed-size chunks (last one
            # padded) bound it at (blk, n_user) with one compile
            n = cold.shape[0]
            pad = (-n) % blk
            cold_pad = np.concatenate([np.asarray(cold),
                                       np.zeros(pad, cold.dtype)])
            outs = [
                self._infer_jit(
                    self.actor, self.content[cold_pad[s: s + blk]]
                )
                for s in range(0, n + pad, blk)
            ]
            gen = jnp.concatenate(outs, axis=0)[:n]
        item_emb = self.item_table.at[cold].set(gen)
        # unclassified item columns score 0 (USIM.py:594-600)
        item_emb = item_emb * self._col_mask[:, None]
        return self.user_table, item_emb

    def save(self):
        self.best_user_emb = self.user_emb
        self.best_item_emb = self.item_emb

    def loss_fn(self, params, batch, key):  # trainer contract, unused
        raise NotImplementedError

    def forward_tables(self, params):
        return self._eval_tables()
