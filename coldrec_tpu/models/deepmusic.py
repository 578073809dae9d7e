"""DeepMusic cold-start generator (reference: model/DeepMusic.py).

MLP (content -> 2d -> d) regresses the frozen backbone embeddings of the
cold-object side: per batch, MSE between backbone emb of the positive
entities and the generated content embedding + L2 on the generated emb
(DeepMusic.py:22-29). Eval tables = frozen backbone tables with cold rows
overwritten by generator(content) (DeepMusic.py:42-47).
"""
from __future__ import annotations


from ..ops.losses import l2_reg_loss, mse_loss
from .cold_base import ColdStartModelBase
from .common import mlp_apply, mlp_params


class DeepMusic(ColdStartModelBase):
    def __init__(self, config):
        super().__init__(config)
        self.backbone = self.load_backbone()
        d = self.emb_size
        self.params = {
            "transform": mlp_params(
                self.next_key(), [self.content_dim, 2 * d, d]
            )
        }
        self.content = self.cold_side_content
        self.setup_optimizer()

    def _generate(self, params, idx):
        return mlp_apply(params["transform"], self.content[idx])

    def loss_fn(self, params, batch, key):
        side = "pos_item" if self.args.cold_object == "item" else "user"
        table = (
            self.backbone["item_emb"]
            if self.args.cold_object == "item"
            else self.backbone["user_emb"]
        )
        idx = batch[side]
        target = table[idx]
        gen = self._generate(params, idx)
        w = batch["weight"]
        return mse_loss(gen, target, w) + l2_reg_loss(self.reg, gen, weight=w)

    def forward_tables(self, params):
        gen = self._generate(params, self.cold_idx)
        return self.patch_cold_rows(
            self.backbone["user_emb"], self.backbone["item_emb"], gen
        )
