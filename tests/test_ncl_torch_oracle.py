"""NCL math locked against the live PyTorch reference (model/NCL.py).

NCL's accuracy-parity artifact is medium-scale only (the reference side at
ml costs ~100 s/epoch through the faiss shim — see tools/regen_parity.sh),
so this test supplies the deterministic counterpart: it instantiates the
reference's LGCN_Encoder + NCL loss methods on the same tiny dataset,
copies the embedding tables into our pytree, injects IDENTICAL k-means
state on both sides (the kmeans itself is documented
statistically-equivalent, not bitwise), and pins to fp32 precision:

  1. the 3-layer-mean LightGCN forward (torch.sparse.mm vs our SpMM)
  2. the warm-up loss: BPR + L2 + ssl_layer_loss (NCL.py:68-116)
  3. the post-warm-up ProtoNCE term (NCL.py:57-66)
"""
import os
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def both(ref_env):
    import torch

    from model.NCL import LGCN_Encoder, NCL as RefNCL

    from coldrec_tpu.config import default_args
    from coldrec_tpu.data.synthetic import synthetic_dataset
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config

    data, _ = synthetic_dataset(
        n_users=50, n_items=70, n_inter=1200, cold_object="item", seed=5
    )
    args = default_args(
        model="NCL", dataset="synth", epochs=1, bs=64, emb_size=16,
        seed=9, layers=2, hyper_layers=1, num_clusters=8, save_emb=False,
    )
    ours = model_factory(Config(args, data))

    fake_data = types.SimpleNamespace(
        user_num=data.user_num, item_num=data.item_num,
        norm_adj=data.normalize_graph(data.bipartite_adjacency()),
    )
    torch.manual_seed(1)
    enc = LGCN_Encoder(fake_data, 16, 2, torch.device("cpu"))
    ref = RefNCL.__new__(RefNCL)  # loss methods only; skip trainer plumbing
    ref.data = fake_data
    ref.model = enc
    ref.emb_size = 16
    ref.ssl_temp = ours.ssl_temp
    ref.ssl_reg = ours.ssl_reg
    ref.hyper_layers = 1
    ref.alpha = ours.alpha
    ref.proto_reg = ours.proto_reg
    ref.k = 8
    ref.batch_size = 64

    # same tables on both sides
    import jax.numpy as jnp

    ours.params = {
        "user_emb": jnp.asarray(enc.embedding_dict["user_emb"].detach().numpy()),
        "item_emb": jnp.asarray(enc.embedding_dict["item_emb"].detach().numpy()),
    }
    return ref, ours, data


def test_lgcn_forward_matches(both):
    import torch

    ref, ours, data = both
    with torch.no_grad():
        ru, ri, _ = ref.model()
    ut, it = ours.forward_tables(ours.params)
    np.testing.assert_allclose(np.asarray(ut), ru.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(it), ri.numpy(), atol=2e-5)


def _batch(data, ours, n=48, seed=2):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    u = rng.integers(0, data.user_num, n)
    i = rng.integers(0, data.item_num, n)
    j = rng.integers(0, data.item_num, n)
    return u, i, j, {
        "user": jnp.asarray(u), "pos_item": jnp.asarray(i),
        "neg_item": jnp.asarray(j), "weight": jnp.ones((n,), jnp.float32),
    }


def test_warmup_loss_matches(both):
    import torch

    from util.utils import bpr_loss as t_bpr, l2_reg_loss as t_l2

    ref, ours, data = both
    u, i, j, batch = _batch(data, ours)
    with torch.no_grad():
        ru, ri, emb_list = ref.model()
        ue, pe, ne = ru[u], ri[i], ri[j]
        t_loss = (
            t_bpr(ue, pe, ne) + t_l2(ours.reg, ue, pe, ne)
            + ref.ssl_layer_loss(emb_list[ref.hyper_layers * 2], emb_list[0],
                                 torch.tensor(u), torch.tensor(i))
        )
    j_loss = ours._full_loss(ours.params, batch, None)
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=2e-5)


def test_protonce_matches(both):
    import jax.numpy as jnp
    import torch

    ref, ours, data = both
    rng = np.random.default_rng(11)
    uc = rng.standard_normal((8, 16)).astype(np.float32)
    ic = rng.standard_normal((8, 16)).astype(np.float32)
    u2c = rng.integers(0, 8, data.user_num)
    i2c = rng.integers(0, 8, data.item_num)
    ref.user_centroids = torch.tensor(uc)
    ref.item_centroids = torch.tensor(ic)
    ref.user_2cluster = torch.tensor(u2c)
    ref.item_2cluster = torch.tensor(i2c)

    u, i, j, batch = _batch(data, ours, n=64, seed=3)
    with torch.no_grad():
        _, _, emb_list = ref.model()
        t_proto = ref.ProtoNCE_loss(emb_list[0], u, i)
    _, _, embs = ours._layer_embs(ours.params)
    j_proto = ours._proto_loss(
        embs, batch,
        (jnp.asarray(uc), jnp.asarray(u2c), jnp.asarray(ic), jnp.asarray(i2c)),
    )
    np.testing.assert_allclose(float(j_proto), float(t_proto), rtol=2e-5)
