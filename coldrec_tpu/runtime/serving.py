"""Online retrieval serving over trained embedding tables.

The reference has no serving entry point — its inference API is
``predict``/``batch_predict`` on the *live trainer object* (SURVEY §3.5;
ColdRec model/BaseRecommender.py:63-107, model/MF.py:52-63), so serving a
trained model means re-instantiating the whole training stack. This module
closes that gap TPU-natively:

  * :class:`RetrievalServer` loads one npz checkpoint-bus artifact (the
    tables every model's ``save_emb`` writes — checkpoints.py), keeps them
    device-resident, and answers exclusion-masked top-k queries through the
    fused Pallas retrieval kernel (ops/pallas/retrieval.py) — the same
    production path as evaluation, so served lists are id-exact against
    the offline protocol (including torch's lowest-index tie rule).
  * With a ``mesh``, the item table is row-sharded over the model axis and
    queries ride :func:`coldrec_tpu.parallel.ops.sharded_retrieval_topk`
    (per-shard kernel + ghost-bound merge over ICI) — serving item spaces
    too large for one chip's HBM.
  * ``bf16=True`` serves the exact top-k of bf16-rounded scores (higher
    throughput; never the parity default — see retrieval.py).

Plain-python host API: inputs are mapped user ids (or raw ids when the
server is built with the dataset), outputs are numpy arrays.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .eval import mask_bias_vector, masked_topk


class RetrievalServer:
    """Masked top-k retrieval over fixed (user_emb, item_emb) tables.

    Parameters
    ----------
    user_emb, item_emb : (U, d) / (I, d) float arrays (checkpoint-bus keys).
    dataset : optional ColdStartDataset. When given, queries may use RAW
        user ids, results may be returned as RAW item ids, and
        ``exclude_rated=True`` masks each user's training interactions
        (the reference eval protocol's rated mask,
        BaseRecommender.py:175-177).
    exclude_items : optional int array of mapped item ids globally removed
        from the candidate pool (the protocol's cross-split candidate
        mask, BaseRecommender.py:130-143).
    mesh : optional jax Mesh with a model axis; shards the item table
        row-wise and serves through the multi-chip kernel.
    """

    def __init__(
        self,
        user_emb: np.ndarray,
        item_emb: np.ndarray,
        dataset=None,
        exclude_items: Optional[np.ndarray] = None,
        mesh=None,
    ):
        self.data = dataset
        self.n_users, self.d = user_emb.shape
        self.n_items = item_emb.shape[0]
        self.mesh = mesh
        bias = mask_bias_vector(self.n_items, exclude_items)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import AXIS_MODEL
            from ..parallel.ops import pad_rows, shard_rows

            n_model = mesh.shape[AXIS_MODEL]
            items_p = pad_rows(np.asarray(item_emb, np.float32), n_model)
            # pad rows are excluded so they can never be recommended
            bias_p = np.ones(items_p.shape[0], dtype=bool)
            bias_p[: self.n_items] = bias
            self.item_emb = shard_rows(mesh, jnp.asarray(items_p))
            self.bias = jax.device_put(
                jnp.asarray(bias_p), NamedSharding(mesh, P(AXIS_MODEL))
            )
            self._n_items_padded = items_p.shape[0]
        else:
            self.item_emb = jnp.asarray(item_emb, jnp.float32)
            self.bias = jnp.asarray(bias)
        self.user_emb = jnp.asarray(user_emb, jnp.float32)

    # ------------------------------------------------------------ factory
    @classmethod
    def from_checkpoint(
        cls,
        emb_dir: str,
        dataset_name: str,
        cold_object: str,
        model: str,
        dataset=None,
        exclude_items: Optional[np.ndarray] = None,
        mesh=None,
    ) -> "RetrievalServer":
        """Build from the npz checkpoint bus (the artifact every model's
        ``--save_emb`` run writes; cold models write cold-patched tables)."""
        from .checkpoints import load_embeddings

        t = load_embeddings(emb_dir, dataset_name, cold_object, model)
        return cls(
            t["user_emb"], t["item_emb"],
            dataset=dataset, exclude_items=exclude_items, mesh=mesh,
        )

    # ------------------------------------------------------------- queries
    def _rated(self, uids: np.ndarray, exclude_rated: bool) -> np.ndarray:
        if exclude_rated and self.data is not None:
            return self.data.rated_padded(uids.astype(np.int32))
        # pad id == n_items: matches no real item
        return np.full((uids.shape[0], 1), self.n_items, np.int32)

    def topk(
        self,
        user_ids,
        k: int,
        exclude_rated: bool = True,
        raw_ids: bool = False,
        bf16: bool = False,
        interpret: Optional[bool] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (scores, item_ids) for a batch of users.

        ``raw_ids=True`` (requires ``dataset``) maps raw user ids in and
        raw item ids out. Exactness: identical ranked lists to the offline
        eval sweep under the same masks (the kernel's ghost-bound argument
        + torch tie order; tests/test_serving.py pins both paths).
        """
        uids = np.asarray(user_ids)
        if raw_ids:
            if self.data is None:
                raise ValueError("raw_ids=True requires dataset")
            uids = self.data.map_users(uids)
        uids = uids.astype(np.int32)
        rated = self._rated(uids, exclude_rated)
        k_eff = min(k, self.n_items)
        ue = self.user_emb[jnp.asarray(uids)]

        if self.mesh is not None:
            from ..parallel.ops import sharded_retrieval_topk

            vals, ids = sharded_retrieval_topk(
                self.mesh, ue, self.item_emb, rated, self.bias, k_eff,
                interpret=(
                    jax.devices()[0].platform != "tpu"
                    if interpret is None else interpret
                ),
            )
            ids = np.where(ids >= self.n_items, self.n_items, ids)
        else:
            from ..ops.pallas.retrieval import LANES, SLOTS, retrieval_topk

            on_tpu = jax.devices()[0].platform == "tpu"
            if k_eff + rated.shape[1] <= SLOTS * LANES and (
                self.n_items >= 2 * LANES or on_tpu
            ):
                vals, ids = retrieval_topk(
                    ue, self.item_emb, rated, self.bias, k_eff,
                    interpret=not on_tpu if interpret is None else interpret,
                    bf16=bf16,
                )
            else:  # heavy-rated users or tiny item spaces: XLA sweep
                scores = ue @ self.item_emb.T
                v, i = masked_topk(
                    scores, jnp.asarray(rated), self.bias, k_eff
                )
                vals, ids = np.asarray(v), np.asarray(i)
        if raw_ids:
            id2item = np.concatenate(
                [self.data.id2item, [-1]]  # pad id -> -1 sentinel
            )
            ids = id2item[ids]
        return vals, ids
