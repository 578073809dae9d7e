"""Device-side evaluation sweep: masked scoring + top-k retrieval.

Reimplements the reference's ``_evaluate`` hot loop
(BaseRecommender.py:153-188) as a chunked, jit-compiled sweep:

  * scores for a chunk of users come from the model's score function
    (typically ``U[users] @ I.T`` on the MXU);
  * training-rated items are masked to -10e8 via a scatter at padded indices
    (pad index = item_num lands in a dummy column, BaseRecommender.py:175-177);
  * cross-split candidate items are masked to -10e8 (BaseRecommender.py:179-181);
  * ``jax.lax.top_k`` yields the ranked max_N list per user.

Chunks are fixed-size (padded with user 0) so one XLA program serves the
whole sweep. The Pallas fused scoring kernel (ops/pallas/retrieval.py) slots
in behind the same interface for large item spaces.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MASK_VALUE = -10e8  # exact reference constant (BaseRecommender.py:177-180)


@functools.partial(jax.jit, static_argnames=("k",))
def masked_topk(
    scores: jnp.ndarray,  # (B, I)
    rated_pad: jnp.ndarray,  # (B, R) item ids, pad = I
    excluded: jnp.ndarray,  # (I,) bool: True = masked out of the candidate pool
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overfetch-then-mask: take the top (k + R) candidates with only the
    dense candidate mask applied, then reject rated items among that small
    set. Exact — at most R rated items can occupy top slots, so the top
    (k + R) unmasked candidates always contain the masked top k. Avoids
    materializing a (B, I) rated-membership plane (which dominated eval
    runtime at book-crossing item counts) and compiles fast."""
    b, n_items = scores.shape
    r = rated_pad.shape[1]
    masked = jnp.where(excluded[None, :], MASK_VALUE, scores)
    if (k + r) * r > n_items:
        # Heavy-rated regime (e.g. XING: power users rate thousands of a
        # 20k-item space): the overfetch-reject cube below is
        # (B, k+R, R) — 264 GB at the XING parity shape, the allocation
        # that OOM'd the round-5 xing lanes. Here a direct scatter of the
        # rated ids into a widened (B, I+1) mask plane (pad id = I lands
        # in the dummy column, reference BaseRecommender.py:175-177) is
        # strictly smaller, exactly the reference's own formulation.
        rows = jnp.arange(b, dtype=rated_pad.dtype)[:, None]
        plane = jnp.zeros((b, n_items + 1), bool).at[
            rows, rated_pad].set(True, mode="drop")[:, :n_items]
        masked = jnp.where(plane, MASK_VALUE, masked)
        return _hierarchical_topk(masked, min(k, n_items))
    fetch = min(k + r, n_items)
    cand_vals, cand_idx = _hierarchical_topk(masked, fetch)  # (B, k+R)

    # reject rated candidates: broadcast-equality any-reduce over the
    # small (B, k+R, R) cube. NOT a vmapped searchsorted — that lowers to
    # a serial binary-search while loop, the construct that kernel-faults
    # the TPU worker in bulk (CLAUDE.md gotcha; bisected in
    # tools/debug_cgrc_bx.py)
    is_rated = jnp.any(
        cand_idx[:, :, None] == rated_pad[:, None, :], axis=-1
    )
    cand_vals = jnp.where(is_rated, MASK_VALUE, cand_vals)
    vals, pos = jax.lax.top_k(cand_vals, k)
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    return vals, idx


def _hierarchical_topk(masked: jnp.ndarray, k: int):
    """top_k, two-stage for wide item spaces: segment-local top-k then a
    global re-rank of S*k candidates. Exact (k <= segment width), and keeps
    the sort programs small — a single 270k-wide lax.top_k makes the remote
    TPU compiler time out at book-crossing scale."""
    b, n_items = masked.shape
    seg = 4096
    while seg < 2 * k:  # keep k <= segment width (heavy-rated-user overfetch)
        seg *= 2
    if n_items <= 8 * seg:
        return jax.lax.top_k(masked, k)
    pad = (-n_items) % seg
    if pad:
        masked = jnp.concatenate(
            [masked, jnp.full((b, pad), MASK_VALUE * 2.0, masked.dtype)], axis=1
        )
    s = masked.shape[1] // seg
    seg_vals, seg_idx = jax.lax.top_k(masked.reshape(b, s, seg), k)
    offsets = (jnp.arange(s, dtype=seg_idx.dtype) * seg)[None, :, None]
    cand_idx = (seg_idx + offsets).reshape(b, s * k)
    cand_vals = seg_vals.reshape(b, s * k)
    vals, pos = jax.lax.top_k(cand_vals, k)
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    return vals, idx


def mask_bias_vector(
    item_num: int, candidate_mask: Optional[np.ndarray]
) -> np.ndarray:
    """Boolean exclusion vector over the item space."""
    bias = np.zeros(item_num, dtype=bool)
    if candidate_mask is not None and candidate_mask.size:
        bias[candidate_mask] = True
    return bias


class EvalSweep:
    """Precomputed per-(split, setting) eval state + the chunked sweep."""

    def __init__(self, data, cold_object: str, batch_size: int, max_n: int):
        self.data = data
        self.cold_object = cold_object
        # cap the user-chunk width so the (B, I) score plane and its masking
        # intermediates stay within HBM at book-crossing-scale item counts
        # (~2^28 fp32 elements per plane; a few planes are live at once)
        budget = max(64, (1 << 28) // max(int(data.item_num), 1))
        self.batch_size = min(int(batch_size), budget)
        self.max_n = int(max_n)
        self._cache: Dict[Tuple[str, str], dict] = {}

    def _prepare(self, split_name: str, data_type: str) -> dict:
        key = (split_name, data_type)
        if key in self._cache:
            return self._cache[key]
        es = self.data.eval_splits[split_name]
        users = es.users.astype(np.int32)
        n = users.shape[0]
        bs = self.batch_size
        n_chunks = max(1, -(-n // bs))
        padded_users = np.zeros(n_chunks * bs, dtype=np.int32)
        padded_users[:n] = users
        rated = self.data.rated_padded(padded_users)
        bias = mask_bias_vector(
            self.data.item_num,
            self.data.candidate_mask(self.cold_object, data_type),
        )
        rated = rated.reshape(n_chunks, bs, -1)
        # Per-chunk rated width, rounded up to a power of two so distinct
        # program shapes stay bounded. Kept on HOST and uploaded one
        # chunk at a time: the full (n_chunks, bs, R_max) device upload
        # is ~9 GB at the XING statistics (R_max tracks the most prolific
        # user — ~20k ratings) and exhausted the 16 GB chip in the
        # round-5 xing lane; per-chunk slices are hundreds of MB at most
        # and most chunks shrink far below R_max.
        counts = (rated != self.data.item_num).sum(axis=2).max(axis=1)
        widths = [
            min(int(1 << max(int(c) - 1, 0).bit_length()) if c else 1,
                rated.shape[2])
            for c in counts
        ]
        state = {
            "split": es,
            "n_users": n,
            "user_chunks": padded_users.reshape(n_chunks, bs),
            "rated_chunks": rated,
            "rated_widths": widths,
            "bias": jnp.asarray(bias),
        }
        self._cache[key] = state
        return state

    def _rated_chunk(self, st, c: int) -> jnp.ndarray:
        """This chunk's rated ids, width-trimmed to its bucket."""
        return jnp.asarray(st["rated_chunks"][c][:, : st["rated_widths"][c]])

    def run(
        self,
        split_name: str,
        data_type: str,
        score_fn: Callable[[np.ndarray], jnp.ndarray],
    ) -> np.ndarray:
        """Return (n_users, max_n) ranked recommended item ids (mapped).

        Under a multi-process group the user chunks are partitioned
        round-robin across processes (each host scores only its share with
        local programs) and the per-host rec lists merge through one
        process_allgather — the multi-host split of the reference's
        single-GPU eval loop (BaseRecommender.py:170-183).
        """
        st = self._prepare(split_name, data_type)
        n_chunks = st["user_chunks"].shape[0]
        if jax.process_count() > 1:
            return self._run_multiprocess(st, n_chunks, score_fn)
        outs = []
        for c in range(n_chunks):
            users = st["user_chunks"][c]
            scores = score_fn(users)
            _, idx = masked_topk(
                scores, self._rated_chunk(st, c), st["bias"], self.max_n
            )
            outs.append(idx)
        rec = jnp.concatenate(outs, axis=0)[: st["n_users"]]
        return np.asarray(jax.device_get(rec))

    def _run_multiprocess(self, st, n_chunks: int, score_fn) -> np.ndarray:
        from ..parallel.distributed import allgather_host, partition_chunks

        mine, pc, _ = partition_chunks(n_chunks)
        slots = -(-n_chunks // pc)  # equal per-process slot count
        bs = st["user_chunks"].shape[1]
        local = np.zeros((slots, bs, self.max_n), np.int32)
        for slot, c in enumerate(mine):
            scores = score_fn(st["user_chunks"][c])
            _, idx = masked_topk(
                scores, self._rated_chunk(st, c), st["bias"], self.max_n
            )
            local[slot] = np.asarray(jax.device_get(idx))
        gathered = allgather_host(local)  # (pc, slots, bs, max_n)
        rec = np.concatenate(
            [gathered[c % pc, c // pc] for c in range(n_chunks)], axis=0
        )
        return rec[: st["n_users"]]

    def pallas_supported(self, split_name: str, data_type: str) -> bool:
        """The fused kernel emits SLOTS*LANES candidates per user; the
        overfetch-then-reject scheme is exact only while k + rated_width
        fits in that stream (retrieval.py exactness argument)."""
        from ..ops.pallas.retrieval import LANES, SLOTS

        st = self._prepare(split_name, data_type)
        return self.max_n + max(st["rated_widths"]) <= SLOTS * LANES

    def run_pallas(
        self,
        split_name: str,
        data_type: str,
        user_emb: jnp.ndarray,
        item_emb: jnp.ndarray,
        interpret: bool = False,
        bf16: bool = False,
    ) -> np.ndarray:
        """Same sweep through the fused Pallas retrieval kernel
        (ops/pallas/retrieval.py) — selected with --eval_backend pallas
        (or pallas_bf16 for bf16 score tiles, see retrieval.py)."""
        from ..ops.pallas.retrieval import retrieval_topk

        st = self._prepare(split_name, data_type)
        users = st["user_chunks"].reshape(-1)[: st["n_users"]]
        width = max(st["rated_widths"])
        rated = jnp.asarray(st["rated_chunks"][:, :, :width].reshape(
            -1, width
        )[: st["n_users"]])
        ue = jnp.asarray(user_emb)[jnp.asarray(users)]
        _, ids = retrieval_topk(
            ue,
            jnp.asarray(item_emb),
            rated,
            st["bias"],
            self.max_n,
            interpret=interpret,
            bf16=bf16,
        )
        return ids
