"""Deterministic AGNN cross-implementation diagnostic.

PARITY_AGNN.json (medium scale) showed ours below the reference in all 12
cells — systematic-looking, but every cell inside tolerance. This tool
separates "model math diverges" from "backbone/KNN draw noise": it
instantiates the reference AGNN_Learner (model/AGNN.py) and our AGNN on the
SAME tiny synthetic dataset, copies the torch weights into our param pytree,
kills both RNG paths (dropout=0, z=mu), and diffs every intermediate:

  1. the precomputed cosine-KNN neighbour graph
  2. semantic_x (content encoder output)
  3. the gated GCN embeds (users and items)
  4. the VAE mu-decode used for cold-row patching
  5. the full training loss on one fixed batch

Run CPU-forced: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/debug_agnn_parity.py
"""
import contextlib
import os
import sys
import tempfile
import types

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@contextlib.contextmanager
def _scoped_reference_paths():
    """Put [faiss shim, /root/reference, repo root] on sys.path, reversibly.

    All mutation is scoped so that importing this module is side-effect-free
    (tests/test_agnn_torch_oracle.py imports it inside the pytest process;
    ADVICE r2). The reference package needs the faiss shim because
    model/__init__ imports KNN.py.
    """
    from parity_check import FAISS_SHIM  # tools/ is on sys.path in both entry modes

    shim_dir = tempfile.mkdtemp(prefix="agnn_shim_")
    with open(os.path.join(shim_dir, "faiss.py"), "w") as f:
        f.write(FAISS_SHIM)
    inserted = [shim_dir, REF, REPO]
    for p in reversed(inserted):
        sys.path.insert(0, p)
    try:
        yield
    finally:
        for p in inserted:
            if p == REPO:
                continue  # the repo root is never pollution
            while p in sys.path:
                sys.path.remove(p)
        for name, mod in list(sys.modules.items()):
            f = getattr(mod, "__file__", None)
            if f and (f.startswith(REF + os.sep) or f.startswith(shim_dir)):
                del sys.modules[name]


def t2n(t):
    return t.detach().cpu().numpy()


_DIFFS = {}


def diff(name, a, b, tol=2e-4):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = float(np.max(np.abs(a - b))) if a.size else 0.0
    _DIFFS[name] = d
    ok = d <= tol
    print(f"  {'OK ' if ok else 'DIVERGES'}  {name:34s} max|diff|={d:.3e}")
    return ok


def main():
    with _scoped_reference_paths():
        return _run()


def _run():
    import jax.numpy as jnp
    import torch

    from coldrec_tpu.config import default_args
    from coldrec_tpu.data.synthetic import synthetic_dataset
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.models.agnn import _vae_p, _vae_q
    from coldrec_tpu.ops.losses import bpr_loss, l2_reg_loss, mse_loss
    from coldrec_tpu.runtime.trainer import Config

    from model.AGNN import AGNN_Learner

    data, _ = synthetic_dataset(
        n_users=40, n_items=60, n_inter=900, cold_object="item",
        content_dim=8, seed=3,
    )

    ref_args = types.SimpleNamespace(
        cold_object="item", agnn_knn_k=5, agnn_dropout=0.0,
        agnn_rank_weight=1.0, agnn_align_weight=1.0, agnn_vae_lambda=1.0,
        agnn_no_backbone=True, agnn_finetune=False, agnn_eval_chunk=512,
    )
    ref_data = types.SimpleNamespace(
        user_num=data.user_num, item_num=data.item_num,
        mapped_item_content=data.item_content,
        mapped_user_content=data.user_content,
        mapped_warm_item_idx=data.mapped_warm_item_idx,
        mapped_warm_user_idx=data.mapped_warm_user_idx,
    )
    torch.manual_seed(0)
    ref = AGNN_Learner(ref_args, ref_data, emb_size=16, device="cpu")
    ref.eval()  # dropout off; we compare the z=mu path explicitly

    args = default_args(
        model="AGNN", dataset="synth", epochs=1, bs=64, emb_size=16,
        seed=11, agnn_no_backbone=True, agnn_dropout=0.0, agnn_knn_k=5,
        save_emb=False,
    )
    ours = model_factory(Config(args, data))

    # ---- 1. KNN graphs (computed independently on the same content)
    # knn_item comes from shared content -> must agree; knn_user (no user
    # content at item cold) is built from each side's INITIAL id embeddings,
    # so it reflects the init draw, not model math — noted, then unified.
    print("== KNN graph ==")
    knn_ok = diff("knn_item ids (content-based)", np.asarray(ours.knn_item),
                  t2n(ref._knn_item_cpu), tol=0)
    knn_ok &= diff("knn_user ids (init-draw-based)", np.asarray(ours.knn_user),
                   t2n(ref._knn_user_cpu), tol=0)

    # ---- copy torch weights into our pytree (torch Linear W is (out,in))
    def lin(mod):
        return {"w": jnp.asarray(t2n(mod.weight).T),
                "b": jnp.asarray(t2n(mod.bias))}

    def vae(v):
        return {"enc1": lin(v.enc1), "mu": lin(v.enc_mu),
                "logvar": lin(v.enc_logvar), "dec1": lin(v.dec1),
                "dec2": lin(v.dec2)}

    p = dict(ours.params)
    p["user_emb"] = jnp.asarray(t2n(ref.embedding_dict["user_emb"]))
    p["item_emb"] = jnp.asarray(t2n(ref.embedding_dict["item_emb"]))
    p["enc_item"] = [lin(ref.encoder_item[0]), lin(ref.encoder_item[3])]
    p["enc_user"] = [lin(ref.encoder_user[0]), lin(ref.encoder_user[3])]
    for k in ("dense_self", "dense_hop", "dense_addgate", "dense_erasegate"):
        p[k] = lin(getattr(ref, k))
    p["user_vae"] = vae(ref.user_vae)
    p["item_vae"] = vae(ref.item_vae)
    ours.params = p
    if not knn_ok:
        # isolate the math comparison from a KNN tie difference
        ours.knn_item = jnp.asarray(t2n(ref._knn_item_cpu))
        ours.knn_user = jnp.asarray(t2n(ref._knn_user_cpu))
        print("  (copied reference KNN graph into ours for the math diff)")

    n_u, n_i = data.user_num, data.item_num
    all_u = torch.arange(n_u)
    all_i = torch.arange(n_i)

    print("== forward components (dropout off) ==")
    with torch.no_grad():
        diff("semantic_x items",
             np.asarray(ours._semantic_x(p, jnp.arange(n_i), False, None)),
             t2n(ref._semantic_x(all_i, is_user=False)))
        diff("semantic_x users",
             np.asarray(ours._semantic_x(p, jnp.arange(n_u), True, None)),
             t2n(ref._semantic_x(all_u, is_user=True)))
        diff("gcn_embed items",
             np.asarray(ours._gcn_embed(p, jnp.arange(n_i), False, None)),
             t2n(ref.forward_gcn_item(all_i)))
        diff("gcn_embed users",
             np.asarray(ours._gcn_embed(p, jnp.arange(n_u), True, None)),
             t2n(ref.forward_gcn_user(all_u)))
        x = ours._semantic_x(p, jnp.arange(n_i), False, None)
        mu, _ = _vae_q(p["item_vae"], x)
        diff("vae mu-decode (cold patch)",
             np.asarray(_vae_p(p["item_vae"], mu)),
             t2n(ref.generate_item_emb(all_i, training=False)))

    # ---- full loss on a fixed batch, z = mu on both sides
    rng = np.random.default_rng(7)
    B = 32
    uid = rng.integers(0, n_u, B)
    iid = rng.integers(0, n_i, B)
    nid = rng.integers(0, n_i, B)
    reg = 0.001

    print("== training loss (z = mu) ==")
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    ref.train()  # reparam samples; zeros -> z = mu. dropout p=0.0 is a no-op
    try:
        tl = ref.loss(torch.tensor(uid), torch.tensor(iid),
                      torch.tensor(nid), reg)
    finally:
        torch.randn_like = orig_randn_like
        ref.eval()

    w = jnp.ones((B,), jnp.float32)
    ju, ji, jn = jnp.asarray(uid), jnp.asarray(iid), jnp.asarray(nid)
    u_g = ours._gcn_embed(p, ju, True, None)
    pos_g = ours._gcn_embed(p, ji, False, None)
    neg_g = ours._gcn_embed(p, jn, False, None)
    rank = bpr_loss(u_g, pos_g, neg_g, w)
    x = ours._semantic_x(p, ji, False, None)
    target = p["item_emb"][ji]
    mu, logvar = _vae_q(p["item_vae"], x)
    gen = _vae_p(p["item_vae"], mu)
    recon = mse_loss(gen, target, w)
    kl = -0.5 * jnp.mean(jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=1))
    gen_rank = bpr_loss(u_g, gen, neg_g, w)
    align = mse_loss(gen, target, w)
    regl = l2_reg_loss(reg, u_g, pos_g, neg_g, gen, weight=w)
    jl = rank + 1.0 * gen_rank + 1.0 * align + 1.0 * (recon + kl) + regl
    diff("total loss", np.asarray(jl), t2n(tl), tol=5e-5)
    print(f"  torch loss={float(tl.detach()):.6f}  jax loss={float(jl):.6f}")
    return dict(_DIFFS)


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    main()
