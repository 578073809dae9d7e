"""Shared machinery for cold-start models.

The reference's cold-start models share three patterns (SURVEY §2.3):

  (a) "generator" models map content -> embedding space and overwrite the
      cold rows of the item/user table at eval time (GAR.py:44-49,
      DeepMusic.py:42-47, MetaEmbedding.py:56-61, ...);
  (b) "re-encoder" models re-encode all users+items through a content-aware
      tower (DropoutNet.py:126-135, Heater.py:127-136);
  (c) "joint" models train their own tables with content paths inline.

This base extends the shared epoch loop with: backbone checkpoint loading
from the embedding bus, the cold-object-side content matrix as a device
array, and the cold-row patch helper used by every generator.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..runtime.checkpoints import load_embeddings
from .warm_base import WarmBackboneTrainer


class ColdStartModelBase(WarmBackboneTrainer):
    def load_backbone(
        self, model: str = None, required=("user_emb", "item_emb")
    ) -> Dict[str, jnp.ndarray]:
        """Load frozen backbone tables from the emb bus (e.g. DeepMusic.py:107-114)."""
        tensors = load_embeddings(
            self.args.emb_dir,
            self.dataset_name,
            self.args.cold_object,
            model or self.args.backbone,
            required=required,
        )
        return {k: jnp.asarray(v) for k, v in tensors.items()}

    # ------------------------------------------------------------- content
    @property
    def cold_side_content(self) -> jnp.ndarray:
        """(N, c) content matrix of the cold-object side (mapped order)."""
        if self.args.cold_object == "item":
            content = self.data.item_content
        else:
            content = self.data.user_content
        if content is None:
            raise ValueError(
                f"{self.model_name} requires {self.args.cold_object} content"
            )
        return jnp.asarray(content)

    @property
    def content_dim(self) -> int:
        return int(self.cold_side_content.shape[1])

    @property
    def cold_idx(self) -> jnp.ndarray:
        """Mapped ids of the cold-side entities."""
        if self.args.cold_object == "item":
            return jnp.asarray(self.data.mapped_cold_item_idx)
        return jnp.asarray(self.data.mapped_cold_user_idx)

    @property
    def warm_idx(self) -> jnp.ndarray:
        if self.args.cold_object == "item":
            return jnp.asarray(self.data.mapped_warm_item_idx)
        return jnp.asarray(self.data.mapped_warm_user_idx)

    # ------------------------------------------------------------ patching
    def patch_cold_rows(
        self,
        user_emb: jnp.ndarray,
        item_emb: jnp.ndarray,
        generated: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Overwrite cold rows of the cold-object-side table with generated
        embeddings (the shared generator eval prologue, e.g. GAR.py:44-49)."""
        if self.args.cold_object == "item":
            return user_emb, item_emb.at[self.cold_idx].set(generated)
        return user_emb.at[self.cold_idx].set(generated), item_emb

    def require_item_cold(self):
        """Guard for item-only models (e.g. CLCRec.py:12-13, ALDI.py:28-31)."""
        if self.args.cold_object != "item":
            raise ValueError(
                f"{self.model_name} only supports item cold-start "
                f"(got cold_object={self.args.cold_object})"
            )
