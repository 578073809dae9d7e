"""CGRC math locked against the live PyTorch reference (model/CGRC.py).

CGRC's parity artifact is medium-scale only (the reference rebuilds and
normalizes a masked scipy graph per batch — CPU-expensive at ml), so this
supplies the deterministic counterpart. Our training loop samples the L_E
edge subset and the L_R shared item set differently by design (documented in
models/cgrc.py), so the oracle pins the deterministic COMPONENTS with the
stochastic inputs injected identically on both sides:

  * the full Ĝ inference path (CGRC.py:370-401: frozen-cold propagation,
    edge-MLP logits, per-item top-k users, Ĝ union rebuild, LightGCN on Ĝ,
    final score matrix) — end to end;
  * L_R (Eq. 8, CGRC.py:258-287) given the same z tables and shared item
    set B (incl. the rated-mask logsumexp denominator);
  * the L_E per-edge softmax terms (Eq. 6, CGRC.py:206-256) given the same
    simulated-cold set over the FULL masked-edge list, through the masked-G'
    frozen propagation (CGRC.py:76-103) on both sides.

Reference trainer methods are invoked unbound on a namespace carrying only
the fields they read, so no reference data pipeline is needed.
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
HID = 32


@pytest.fixture(scope="module")
def both(ref_env):
    import torch

    from model.CGRC import CGRCNet, _sparse_adj_tensor

    from coldrec_tpu.config import default_args
    from coldrec_tpu.data.synthetic import synthetic_dataset
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config

    data, _ = synthetic_dataset(
        n_users=40, n_items=60, n_inter=900, cold_object="item",
        content_dim=10, seed=13,
    )
    args = default_args(
        model="CGRC", dataset="synth", epochs=1, bs=32, emb_size=D,
        seed=21, save_emb=False, cgrc_mlp_hidden=HID, cgrc_recon_topk=7,
    )
    ours = model_factory(Config(args, data))

    torch.manual_seed(3)
    net = CGRCNet(
        data.user_num, data.item_num, data.item_content_dim, D, HID,
        np.asarray(data.item_content, np.float32),
    )

    import jax.numpy as jnp

    def lin(mod):
        return {"w": jnp.asarray(mod.weight.detach().numpy().T),
                "b": jnp.asarray(mod.bias.detach().numpy())}

    ours.params = {
        "user_emb": jnp.asarray(net.user_emb.detach().numpy()),
        "item_lin": lin(net.item_lin),
        "edge_mlp": [lin(net.edge_mlp[0]), lin(net.edge_mlp[2])],
    }

    # the per-user rated sets the reference trainer precomputes (CGRC.py:175)
    user_rated = [set() for _ in range(data.user_num)]
    for u, i in data.train_pairs:
        user_rated[int(u)].add(int(i))
    user_rated = [frozenset(s) for s in user_rated]

    sparse_full = _sparse_adj_tensor(
        data.normalize_graph(data.bipartite_adjacency()), torch.device("cpu")
    )
    return ours, net, data, user_rated, sparse_full


def test_full_graph_tables_match(both):
    import torch

    from model.CGRC import _lightgcn_mean_all_layers

    ours, net, data, _, sparse_full = both
    with torch.no_grad():
        zu, zi = _lightgcn_mean_all_layers(
            sparse_full, net.user_emb, net.item_x(), data.user_num, ours.Lf
        )
    x_all = ours._item_x(ours.params)
    ju, ji = ours._lightgcn_full(
        ours.full_graph, ours.params["user_emb"], x_all, ours.Lf
    )
    np.testing.assert_allclose(np.asarray(ju), zu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ji), zi.numpy(), atol=2e-5)


def test_ghat_inference_scores_match(both):
    import torch

    from model.CGRC import CGRC

    ours, net, data, _, sparse_full = both
    ns = types.SimpleNamespace(
        data=types.SimpleNamespace(
            user_num=data.user_num, item_num=data.item_num,
            interaction_mat=data.interaction_csr,
            normalize_graph_mat=data.normalize_graph,
            mapped_cold_item_idx=np.asarray(data.mapped_cold_item_idx),
        ),
        Lg=ours.Lg, Lh=ours.Lh, topk=ours.topk,
        device=torch.device("cpu"), sparse_full=sparse_full,
    )
    with torch.no_grad():
        ref_scores = CGRC._forward_scores_ghat(ns, net).numpy()

    ut, it = ours.forward_tables(ours.params)
    our_scores = np.asarray(ut) @ np.asarray(it).T
    np.testing.assert_allclose(our_scores, ref_scores, atol=5e-5)


def test_ranking_loss_matches(both):
    import jax.numpy as jnp
    import torch

    from model.CGRC import CGRC

    ours, net, data, user_rated, sparse_full = both
    rng = np.random.default_rng(17)
    b = 24
    u = rng.integers(0, data.user_num, b)
    pos = rng.integers(0, data.item_num, b)
    extra = rng.integers(0, data.item_num, ours.ranking_neg)
    b_items = np.concatenate([pos, extra])

    x_all = ours._item_x(ours.params)
    z_u, z_i = ours._lightgcn_full(
        ours.full_graph, ours.params["user_emb"], x_all, ours.Lf
    )
    ns = types.SimpleNamespace(
        tau=ours.tau, device=torch.device("cpu"), _user_rated=user_rated
    )
    with torch.no_grad():
        t_loss = CGRC._ranking_loss(
            ns, torch.tensor(np.asarray(z_u)), torch.tensor(np.asarray(z_i)),
            u.tolist(), pos.tolist(), b_items.tolist(),
        )

    # the SAME L_R reduction loss_fn calls (models/cgrc.py::_ranking_loss),
    # with b_items injected
    j_loss = ours._ranking_loss(
        z_u, z_i, jnp.asarray(u), jnp.asarray(b_items),
        jnp.ones(b, jnp.float32),
    )
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=2e-5)


def test_reconstruction_loss_matches(both):
    import jax.numpy as jnp
    import torch

    from model.CGRC import (
        CGRC,
        _bip_adj_from_R,
        _drop_edges_to_items,
        _propagate_gprime_frozen_cold,
        _sparse_adj_tensor,
        _user_mean_layers_1_to_L,
    )

    ours, net, data, user_rated, _ = both
    rng = np.random.default_rng(23)
    eligible = np.unique(data.train_pairs[:, 1])
    cold_ids = np.sort(rng.choice(eligible, 8, replace=False))
    tp = data.train_pairs
    edges = [(int(u), int(i)) for u, i in tp if int(i) in set(cold_ids.tolist())]
    assert edges, "cold draw produced no masked edges"

    # reference L_E: masked graph rebuild + frozen propagation + Eq. (6)
    R_base = data.interaction_csr
    with torch.no_grad():
        Rm = _drop_edges_to_items(R_base, set(cold_ids.tolist()))
        adj_m = data.normalize_graph(
            _bip_adj_from_R(Rm, data.user_num, data.item_num)
        )
        adj_t = _sparse_adj_tensor(adj_m, torch.device("cpu"))
        cold_t = torch.tensor(cold_ids)
        layers = _propagate_gprime_frozen_cold(
            adj_t, net.user_emb, net.item_x(), data.user_num, ours.Lg, cold_t
        )
        h_u_bar = _user_mean_layers_1_to_L(layers, data.user_num, ours.Lg)
        u_need = sorted({u for u, _ in edges})
        u_tensor = torch.tensor(u_need)
        logits_sub = net.edge_logits_broadcast(
            h_u_bar[u_tensor], net.item_x(), cold_t
        )
        ns = types.SimpleNamespace(
            device=torch.device("cpu"), _user_rated=user_rated
        )
        t_loss = CGRC._reconstruction_loss(
            ns, logits_sub, cold_t, edges, u_tensor
        )

    # ours: same cold set as a mask, the full masked-edge list as the sample
    cold_mask = jnp.zeros(data.item_num, bool).at[jnp.asarray(cold_ids)].set(True)
    x_all = ours._item_x(ours.params)
    graph_m = ours._masked_graph_vals(cold_mask)
    j_h_u_bar = ours._propagate_frozen(
        graph_m, ours.params["user_emb"], x_all, ours.Lg, cold_mask
    )
    np.testing.assert_allclose(
        np.asarray(j_h_u_bar), h_u_bar.detach().numpy(), atol=2e-5
    )
    e_u = jnp.asarray([u for u, _ in edges], jnp.int32)
    e_i = jnp.asarray([i for _, i in edges], jnp.int32)
    pos, lse, has_valid = ours._edge_softmax_terms(
        ours.params, j_h_u_bar[e_u], e_u, e_i, x_all, cold_mask
    )
    # the SAME L_E reduction loss_fn calls (_reconstruction_reduce)
    j_loss = ours._reconstruction_reduce(
        pos, lse, cold_mask[e_i].astype(jnp.float32), has_valid
    )
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=2e-5)
