"""CLCRec math locked against the live PyTorch reference (model/CLCRec.py).

CLCRec's parity artifact is medium-scale only (the reference side costs
29.5 s/epoch there — tools/regen_parity.sh tier 2), so this supplies the
deterministic counterpart: reference CLCRec_Learner and our CLCRec on the
same dataset, torch weights copied into our pytree, the hybrid-set
replacement indices injected identically on both sides, and the FULL loss
(lr_lambda * NCE(pos-emb, feats) + (1-lr_lambda) * NCE(user, hybrid)
+ reg * mean-row-norm, CLCRec.py:125-153) pinned at fp32 precision, plus
the eval-table cold-row patch (encoder output, CLCRec.py:155-157).
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

    from model.CLCRec import CLCRec_Learner

    from coldrec_tpu.config import default_args
    from coldrec_tpu.data.synthetic import synthetic_dataset
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config

    data, _ = synthetic_dataset(
        n_users=40, n_items=60, n_inter=900, cold_object="item",
        content_dim=10, seed=13,
    )
    args = default_args(
        model="CLCRec", dataset="synth", epochs=1, bs=32, emb_size=16,
        seed=21, save_emb=False,
    )
    ours = model_factory(Config(args, data))

    ref_args = types.SimpleNamespace(
        cold_object="item", num_neg=ours.num_neg, temp_value=ours.temp,
        lr_lambda=ours.lr_lambda, num_sample=ours.num_sample, reg=ours.reg,
    )
    ref_data = types.SimpleNamespace(
        user_num=data.user_num, item_num=data.item_num,
        mapped_item_content=data.item_content,
        item_content_dim=data.item_content_dim,
        mapped_cold_item_idx=data.mapped_cold_item_idx,
    )
    torch.manual_seed(3)
    ref = CLCRec_Learner(ref_args, ref_data, 16, torch.device("cpu"))

    import jax.numpy as jnp

    def lin(mod):
        return {"w": jnp.asarray(mod.weight.detach().numpy().T),
                "b": jnp.asarray(mod.bias.detach().numpy())}

    ours.params = {
        "user_emb": jnp.asarray(ref.embedding_dict["user_emb"].detach().numpy()),
        "item_emb": jnp.asarray(ref.embedding_dict["item_emb"].detach().numpy()),
        "enc1": lin(ref.encoder_layer1),
        "enc2": lin(ref.encoder_layer2),
    }
    return ref, ours, data


def test_full_loss_matches(both, monkeypatch):
    import jax
    import jax.numpy as jnp
    import torch

    ref, ours, data = both
    rng = np.random.default_rng(17)
    b, n1 = 24, 1 + ours.num_neg
    u = rng.integers(0, data.user_num, b)
    pos = rng.integers(0, data.item_num, b)
    negs = rng.integers(0, data.item_num, (b, ours.num_neg))
    rand_index = rng.integers(0, b * n1, int(b * n1 * ours.num_sample))

    # reference consumes flattened (B*(1+n)) tensors with users repeated
    items = np.concatenate([pos[:, None], negs], axis=1)
    user_flat = torch.tensor(np.repeat(u, n1))
    item_flat = torch.tensor(items)
    def canned_randint(high, size, *a, **kw):
        # only the hybrid-set draw (CLCRec.py loss) may land here; if any
        # other randint call appears on the reference path, fail loudly
        # instead of silently feeding it the canned indices.
        assert high == b * n1 and size == (len(rand_index),), (high, size)
        return torch.tensor(rand_index)

    monkeypatch.setattr(torch, "randint", canned_randint)
    with torch.no_grad():
        t_loss = ref.loss(user_flat, item_flat)
    monkeypatch.undo()

    batch = {
        "user": jnp.asarray(u), "pos_item": jnp.asarray(pos),
        "neg_items": jnp.asarray(negs),
        "weight": jnp.ones((b,), jnp.float32),
    }
    j_loss = ours.loss_fn(ours.params, batch, jax.random.PRNGKey(0),
                          rand_index=jnp.asarray(rand_index))
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=2e-5)


def test_eval_tables_match(both):
    import torch

    ref, ours, data = both
    with torch.no_grad():
        ru, ri, cold_feat = ref.get_all_embs()
        ru = ru.detach().clone()
        ri = ri.detach().clone()
        ri[torch.tensor(data.mapped_cold_item_idx)] = cold_feat
    ut, it = ours.forward_tables(ours.params)
    np.testing.assert_allclose(np.asarray(ut), ru.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(it), ri.numpy(), atol=2e-5)
