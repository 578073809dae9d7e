"""SimGCL/XSimGCL math locked against the live PyTorch reference.

Both models' parity artifacts are medium-scale (contrastive references get
expensive at ml); this supplies the deterministic counterpart. The only
RNG in either model is the per-layer U(0,1) perturbation noise
(SimGCL.py:101-109 / XSimGCL.py:112-114): the test pre-draws the noise
stacks, feeds them to torch by patching torch.rand_like with a pop-queue
and to our loss_fn via its noise injection hooks, and pins the FULL batch
loss (BPR + L2(user,pos) + cl_rate * InfoNCE) to fp32 precision. Clean
forwards (the eval path, layer mean 1..L excluding ego) are pinned too.
"""
import os
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

N_LAYERS = 2
D = 16


def _make(model_name):
    # caller holds the module-scoped ref_env fixture (shim + REF on sys.path)
    import torch

    from coldrec_tpu.config import default_args
    from coldrec_tpu.data.synthetic import synthetic_dataset
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config

    data, _ = synthetic_dataset(
        n_users=50, n_items=70, n_inter=1200, cold_object="item", seed=6
    )
    args = default_args(
        model=model_name, dataset="synth", epochs=1, bs=64, emb_size=D,
        seed=4, layers=N_LAYERS, save_emb=False,
    )
    ours = model_factory(Config(args, data))

    fake_data = types.SimpleNamespace(
        user_num=data.user_num, item_num=data.item_num,
        norm_adj=data.normalize_graph(data.bipartite_adjacency()),
    )
    ref_args = types.SimpleNamespace(
        eps=ours.eps, l_cl=getattr(ours, "layer_cl", 1), tau=ours.tau,
        cl_rate=ours.cl_rate,
    )
    torch.manual_seed(2)
    if model_name == "SimGCL":
        from model.SimGCL import SimGCL_Encoder

        enc = SimGCL_Encoder(ref_args, fake_data, D, N_LAYERS, torch.device("cpu"))
    else:
        from model.XSimGCL import XSimGCL_Encoder

        enc = XSimGCL_Encoder(ref_args, fake_data, D, N_LAYERS, torch.device("cpu"))

    import jax.numpy as jnp

    ours.params = {
        "user_emb": jnp.asarray(enc.embedding_dict["user_emb"].detach().numpy()),
        "item_emb": jnp.asarray(enc.embedding_dict["item_emb"].detach().numpy()),
    }
    return ours, enc, data, ref_args


def _noise_stacks(data, count, seed):
    rng = np.random.default_rng(seed)
    n = data.user_num + data.item_num
    return [
        rng.random((N_LAYERS, n, D), dtype=np.float32) for _ in range(count)
    ]


class _RandQueue:
    """torch.rand_like replacement popping pre-drawn layers in call order."""

    def __init__(self, stacks):
        import torch

        self._q = [torch.tensor(s[layer]) for s in stacks
                   for layer in range(N_LAYERS)]

    def __call__(self, t, **kw):
        return self._q.pop(0)


def _batch(data, n=48, seed=8):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    u = rng.integers(0, data.user_num, n)
    i = rng.integers(0, data.item_num, n)
    j = rng.integers(0, data.item_num, n)
    return u, i, j, {
        "user": jnp.asarray(u), "pos_item": jnp.asarray(i),
        "neg_item": jnp.asarray(j), "weight": jnp.ones((n,), jnp.float32),
    }


@pytest.mark.parametrize("model_name", ["SimGCL", "XSimGCL"])
def test_clean_forward_matches(model_name, ref_env):
    import torch

    ours, enc, data, _ = _make(model_name)
    with torch.no_grad():
        out = enc(False)
    ut, it = ours.forward_tables(ours.params)
    np.testing.assert_allclose(np.asarray(ut), out[0].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(it), out[1].numpy(), atol=2e-5)


def test_simgcl_full_loss_matches(ref_env, monkeypatch):
    import jax
    import jax.numpy as jnp
    import torch

    from util.utils import InfoNCE, bpr_loss as t_bpr, l2_reg_loss as t_l2

    ours, enc, data, ref_args = _make("SimGCL")
    u, i, j, batch = _batch(data)
    s1, s2 = _noise_stacks(data, 2, seed=21)

    monkeypatch.setattr(torch, "rand_like", _RandQueue([s1, s2]))
    with torch.no_grad():
        ru, ri = enc(False)
        uv1, iv1 = enc(True)
        uv2, iv2 = enc(True)
    monkeypatch.undo()
    with torch.no_grad():
        ue, pe, ne = ru[u], ri[i], ri[j]
        uu = torch.unique(torch.tensor(u))
        iu = torch.unique(torch.tensor(i))
        cl = InfoNCE(uv1[uu], uv2[uu], ref_args.tau) + InfoNCE(
            iv1[iu], iv2[iu], ref_args.tau
        )
        t_loss = (t_bpr(ue, pe, ne) + t_l2(ours.reg, ue, pe)
                  + ours.cl_rate * cl)

    j_loss = ours.loss_fn(
        ours.params, batch, jax.random.PRNGKey(0),
        noise_pair=(jnp.asarray(s1), jnp.asarray(s2)),
    )
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=2e-5)


def test_xsimgcl_full_loss_matches(ref_env, monkeypatch):
    import jax
    import jax.numpy as jnp
    import torch

    from util.utils import InfoNCE, bpr_loss as t_bpr, l2_reg_loss as t_l2

    ours, enc, data, ref_args = _make("XSimGCL")
    u, i, j, batch = _batch(data)
    (s1,) = _noise_stacks(data, 1, seed=22)

    monkeypatch.setattr(torch, "rand_like", _RandQueue([s1]))
    with torch.no_grad():
        ru, ri, cu, ci = enc(True)
    monkeypatch.undo()
    with torch.no_grad():
        ue, pe, ne = ru[u], ri[i], ri[j]
        uu = torch.unique(torch.tensor(u))
        iu = torch.unique(torch.tensor(i))
        # XSimGCL.py:33 — views are (rec, cl) per entity
        cl = InfoNCE(ru[uu], cu[uu], ref_args.tau) + InfoNCE(
            ri[iu], ci[iu], ref_args.tau
        )
        t_loss = (t_bpr(ue, pe, ne) + t_l2(ours.reg, ue, pe)
                  + ours.cl_rate * cl)

    j_loss = ours.loss_fn(
        ours.params, batch, jax.random.PRNGKey(0), noise=jnp.asarray(s1)
    )
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=2e-5)
