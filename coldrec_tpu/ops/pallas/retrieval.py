"""Fused retrieval kernel: blocked dot-product + streaming top-k.

Replaces the reference's eval hot path (BaseRecommender.py:170-183: full
U x I matmul -> scatter rated mask -> candidate mask -> torch.topk) and
faiss IndexFlatIP (KNN.py:63-88) with one Pallas kernel that never
materializes the (U, I) score matrix in HBM. XLA cannot avoid that
materialization (matmul outputs are never fused into sorts), so a fused
kernel beats any XLA formulation of the same sweep — the honest
chained-dependency microbench (tools/ubench_retrieval.py) at book-crossing
shape puts the XLA production path at ~1.8 G pairs/s while a bare
matmul+rowmax reaches ~120 G pairs/s (score-plane write bound).

Masking follows the production overfetch-then-reject scheme
(runtime/eval.py:36-41): only the per-item candidate-exclusion vector is
applied inside the kernel (a (1, IB) broadcast — free); per-user rated
items stay in the candidate stream and are rejected afterwards among the
SLOTS*128 survivors. This avoids the (B, I) rated-membership plane, which
both dominated eval runtime at book-crossing item counts (round-1 PERF
note) and overflowed the remote-compile request as a jit constant.

Algorithm (grid = user tiles x item blocks, running state in VMEM):

  1. score tile (TU, IB) on the MXU (user tile x item block);
  2. mask candidate-excluded items via the broadcast (1, IB) int8 row;
  3. view the tile as (TU, G, 128) lane classes (class = item_id mod 128)
     and extract the block-local top-2 per lane class by a max/argmax
     tournament with knockout — O(1) VPU passes instead of K argmax sweeps;
  4. insert both candidates into a per-lane sorted top-SLOTS running list
     (compare-exchange cascade over SLOTS=8 slots, all lanes in parallel);
  5. every value ever discarded — the block-local 3rd-of-lane maximum and
     each cascade eviction — folds into a per-lane running **ghost** bound.

The kernel emits (TU, SLOTS*128) candidates + (TU, 128) ghosts; `_resolve`
rejects rated candidates (broadcast-equality membership, as in
runtime/eval.py::masked_topk) and takes a trivial top_k over the survivors.

Exactness: let theta = k-th best surviving candidate value for a user.
Every item not among that user's candidates was discarded at some step,
and ghost >= every discarded value. If max(ghost) < theta, at least k
valid candidates beat every non-candidate, so the candidate top-k IS the
global top-k. Users failing the check (requires >2 of the user's
top-(k+R) values in one lane class of one block, or >SLOTS in one lane
class overall — well under 0.1% at k=20, R=64, SLOTS=8) are recomputed
exactly via the XLA masked_topk path. The routing is exact for every user.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -10e8  # reference mask value (BaseRecommender.py:177-180)
INIT_NEG = -4e9  # below NEG: masked items still rank above "nothing seen"
LANES = 128  # TPU lane width; one lane class per item_id mod 128
SLOTS = 8  # running top-SLOTS kept per lane class


def _fused_kernel(block_i, u_ref, it_ref, excl_ref, cv_ref, ci_ref, gh_ref,
                  rv, ri, gh):
    j = pl.program_id(1)
    tu = u_ref.shape[0]
    g = block_i // LANES

    @pl.when(j == 0)
    def _init():
        rv[...] = jnp.full_like(rv, INIT_NEG)
        ri[...] = jnp.zeros_like(ri)
        gh[...] = jnp.full_like(gh, INIT_NEG)

    z = jnp.dot(u_ref[...], it_ref[...], preferred_element_type=jnp.float32)
    z = jnp.where(excl_ref[...] != 0, NEG, z)  # (1, IB) broadcast row

    # streaming top-2-per-lane over contiguous (TU, 128) column slices —
    # pure 2D VPU ops; measured free relative to the bare dot+rowmax
    # (tools/exp_retrieval_kernels.py: 100 vs 104 G pairs/s), where 3D
    # reductions with eq-compare argmax ran 3x slower.
    m1 = jnp.full((tu, LANES), INIT_NEG)
    m2 = jnp.full((tu, LANES), INIT_NEG)
    m3 = jnp.full((tu, LANES), INIT_NEG)
    a1 = jnp.zeros((tu, LANES), jnp.int32)
    a2 = jnp.zeros((tu, LANES), jnp.int32)
    for s in range(g):
        c = z[:, s * LANES:(s + 1) * LANES]
        gt1 = c > m1
        gt2 = c > m2
        m3 = jnp.maximum(m3, jnp.where(gt2, m2, c))  # whatever drops to 3rd
        a2 = jnp.where(gt1, a1, jnp.where(gt2, s, a2))
        m2 = jnp.where(gt1, m1, jnp.where(gt2, c, m2))
        a1 = jnp.where(gt1, s, a1)
        m1 = jnp.where(gt1, c, m1)

    base = j * block_i
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tu, LANES), 1)
    ghost = jnp.maximum(gh[...], m3)  # block-local 3rd+
    for cv, ci in ((m1, base + a1 * LANES + lane_iota),
                   (m2, base + a2 * LANES + lane_iota)):
        for s in range(SLOTS):
            sv, si = rv[s], ri[s]
            swap = cv > sv
            rv[s] = jnp.where(swap, cv, sv)
            ri[s] = jnp.where(swap, ci, si)
            cv = jnp.where(swap, sv, cv)
            ci = jnp.where(swap, si, ci)
        ghost = jnp.maximum(ghost, cv)  # cascade eviction
    gh[...] = ghost

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        cv_ref[...] = jnp.concatenate([rv[s] for s in range(SLOTS)], axis=1)
        ci_ref[...] = jnp.concatenate([ri[s] for s in range(SLOTS)], axis=1)
        gh_ref[...] = gh[...]


@functools.partial(
    jax.jit, static_argnames=("tile_u", "block_i", "interpret")
)
def _fused_sweep(
    users_pad: jnp.ndarray,  # (B_pad, d) f32
    items_t: jnp.ndarray,  # (d, I_pad) f32 — pre-transposed item table
    excl_row: jnp.ndarray,  # (1, I_pad) int8, nonzero = candidate-excluded
    tile_u: int,
    block_i: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b_pad, d = users_pad.shape
    i_pad = items_t.shape[1]
    grid = (b_pad // tile_u, i_pad // block_i)
    kernel = functools.partial(_fused_kernel, block_i)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_u, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_i), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_i), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_u, SLOTS * LANES), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_u, SLOTS * LANES), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_u, LANES), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, SLOTS * LANES), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, SLOTS * LANES), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLOTS, tile_u, LANES), jnp.float32),
            pltpu.VMEM((SLOTS, tile_u, LANES), jnp.int32),
            pltpu.VMEM((tile_u, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(users_pad, items_t, excl_row)


@functools.partial(jax.jit, static_argnames=("k",))
def _resolve(cand_v, cand_i, ghost, rated_pad, k: int):
    """Reject rated candidates, then top-k + the exactness flags.

    Membership is a broadcast equality reduce over (B, SLOTS*128, R) —
    ~67M byte-compares at bench shape, microseconds on the VPU, where a
    vmapped searchsorted lowered to a serial binary search that cost 70 ms
    (20x the kernel itself).

    Tie handling (torch.topk parity — the reference breaks ties by lowest
    index): a row is flagged whenever MORE candidates tie with the k-th
    value than the selection kept (the kernel's lane-structured candidate
    order could then pick a different tied subset than lowest-index-
    first); both flags are permutation-invariant, so the (-value, id)
    re-ordering itself happens on the HOST after download
    (_torch_tie_order) — every device-side formulation of the k-wide
    reorder measured 25-45 G pairs/s off the sweep (lexsort, scatter,
    and one-hot einsum alike; the flags are free). Together with the
    ghost bound the routed result is id-exact, not just value-exact."""
    is_rated = jnp.any(
        cand_i[:, :, None] == rated_pad[:, None, :], axis=-1
    )
    cand_v = jnp.where(is_rated, INIT_NEG, cand_v)
    if k <= 64:
        # k-pass masked argmax selection: XLA's sort-based TopK on the
        # (B, SLOTS*128) candidate matrix costs ~1.3 ms/sweep at bench
        # shape, the fused max/argmax passes ~0.3 ms (+16% headline,
        # identical outputs — argmax and top_k share the lowest-position
        # tie rule). Falls back to lax.top_k for large k where the pass
        # count would overtake the sort.
        v = cand_v
        cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        vals_l, ids_l = [], []
        for _ in range(k):
            m = jnp.max(v, axis=1)
            am = jnp.argmax(v, axis=1)
            vals_l.append(m)
            ids_l.append(
                jnp.take_along_axis(cand_i, am[:, None], axis=1)[:, 0]
            )
            v = jnp.where(cols == am[:, None], INIT_NEG, v)
        vals = jnp.stack(vals_l, axis=1)
        ids = jnp.stack(ids_l, axis=1)
    else:
        vals, pos = jax.lax.top_k(cand_v, k)
        ids = jnp.take_along_axis(cand_i, pos, axis=1)
    theta = vals[:, k - 1]
    n_eq_total = jnp.sum(cand_v == theta[:, None], axis=1)
    n_eq_kept = jnp.sum(vals == theta[:, None], axis=1)
    suspicious = (jnp.max(ghost, axis=1) >= theta) | (n_eq_total > n_eq_kept)
    return vals, ids, suspicious


def _torch_tie_order(vals: np.ndarray, ids: np.ndarray):
    """Host-side (-value, id) reorder of each row — torch.topk's tie rule.
    vals arrive descending from lax.top_k, so this only permutes within
    equal-value runs."""
    order = np.lexsort((ids, -vals), axis=-1)
    return (
        np.take_along_axis(vals, order, axis=1),
        np.take_along_axis(ids, order, axis=1),
    )


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def default_block_i(n_items: int, d: int = 64) -> int:
    """Production item-block width. Wider blocks amortize the per-block
    slot cascade (the kernel is VPU-bound, not DMA- or MXU-bound: bf16
    tiles and bigger user tiles both measured NEUTRAL-to-worse); 8192 is
    the measured optimum at book-crossing width, 16384 regresses on VMEM
    pressure (tools/ubench_kernel_variants.py, PERF.md). bench.py reuses
    this so the headline always measures the production config.

    The (d, block_i) item window is double-buffered against the 16 MB
    scoped-VMEM budget (alongside the score tile and scratch), so wider-d
    sweeps must shrink the block: 8 * d * block_i <= ~8 MB. At d <= 128
    this leaves the measured-optimal 8192 untouched; truly wide d (content
    KNN, e.g. XING's 2,738-dim item content) can't fit a useful block at
    all — ops/knn.py routes those through the XLA path instead."""
    vmem_cap = 8 * 1024 * 1024 // (8 * max(d, 1))  # f32, double-buffered
    cap = max(LANES, (vmem_cap // LANES) * LANES)
    return min(8192, _round_up(n_items, 2048), cap)


def apply_exact_fallback(vals, ids, sus, exact_chunk_fn, chunk=4096):
    """Recompute ghost/tie-flagged rows via `exact_chunk_fn(rows_pad)` in
    fixed-size chunks, scattering results back into (vals, ids) in place.

    Chunking bounds memory when a degenerate score distribution flags
    EVERY row at once (e.g. SimGCL's all-tie cold scores: one unchunked
    (58k, 270k) plane OOM'd at book-crossing scale). Padding policy: row
    counts below `chunk` round up to a multiple of 8 (so distinct small
    program shapes stay bounded at chunk/8, each cheap); larger counts
    round up to whole chunks, so the tail chunk scores up to chunk-1
    duplicate rows — wasted work, but one program shape.
    """
    rows = np.flatnonzero(sus)
    if rows.size == 0:
        return
    n_pad = _round_up(rows.size, 8 if rows.size < chunk else chunk)
    rows_pad = np.zeros(n_pad, np.int64)
    rows_pad[: rows.size] = rows
    fvs, fis = [], []
    for s in range(0, n_pad, chunk):
        fv, fi = exact_chunk_fn(rows_pad[s: s + chunk])
        fvs.append(np.asarray(fv))
        fis.append(np.asarray(fi))
    vals[rows] = np.concatenate(fvs)[: rows.size]
    ids[rows] = np.concatenate(fis)[: rows.size]


@functools.partial(
    jax.jit,
    static_argnames=(
        "i_pad", "b_pad", "tile_u", "block_i", "k", "interpret", "bf16"
    ),
)
def _sweep_padded(
    user_emb, item_emb, rated_pad, excluded,
    i_pad: int, b_pad: int, tile_u: int, block_i: int, k: int,
    *, interpret: bool = False, bf16: bool = False,
):
    """Pad + transpose ON DEVICE, sweep, resolve. Keeping the padding in
    jit means device-resident tables (the production eval case) never
    round-trip through the host — host-side numpy padding re-uploaded the
    69 MB book-crossing item table over the remote tunnel per call and
    cost 100x more than the kernel.

    ``bf16=True`` casts the embedding operands to bfloat16 before the
    kernel (scores still accumulate in f32 via preferred_element_type):
    halves item-block DMA and uses the MXU's native bf16 rate. The result
    is the EXACT top-k of the bf16-rounded scores — near-tie orderings can
    differ from the f32 path, so this mode is opt-in
    (``--eval_backend pallas_bf16``), never the parity default.
    """
    n_users, d = user_emb.shape
    n_items = item_emb.shape[0]
    dt = jnp.bfloat16 if bf16 else user_emb.dtype
    user_emb = user_emb.astype(dt)
    item_emb = item_emb.astype(dt)
    users = jnp.zeros((b_pad, d), dt).at[:n_users].set(user_emb)
    items_t = (
        jnp.zeros((d, i_pad), dt).at[:, :n_items].set(item_emb.T)
    )
    rated = (
        jnp.full((b_pad, rated_pad.shape[1]), n_items, jnp.int32)
        .at[:n_users].set(rated_pad.astype(jnp.int32))
    )
    excl_row = (
        jnp.ones((1, i_pad), jnp.int8)
        .at[0, :n_items].set(excluded.astype(jnp.int8))
    )
    cv, ci, gh = _fused_sweep(users, items_t, excl_row, tile_u, block_i,
                              interpret)
    vals, ids, suspicious = _resolve(cv, ci, gh, rated, k)
    return vals[:n_users], ids[:n_users], suspicious[:n_users]


def retrieval_topk(
    user_emb,
    item_emb,
    rated_pad,  # (U, R) padded rated ids (pad = item_num)
    excluded,  # (item_num,) bool
    k: int,
    tile_u: int = 256,
    block_i: int = 0,
    interpret: bool = False,
    bf16: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full masked top-k sweep; returns (vals (U, k), ids (U, k)). Exact
    (with ``bf16=True``: the exact top-k of the bf16-rounded scores —
    the ghost-flag fallback then also scores in bf16 so every row obeys
    the same rounding).

    Accepts numpy or device arrays; device-resident inputs stay on device.
    """
    n_users, d = user_emb.shape
    n_items = item_emb.shape[0]
    assert k + rated_pad.shape[1] <= SLOTS * LANES, (k, SLOTS * LANES)
    if not block_i:
        block_i = default_block_i(n_items, d)
    assert block_i % LANES == 0, block_i
    i_pad = _round_up(n_items, block_i)
    b_pad = _round_up(n_users, tile_u)
    user_emb = jnp.asarray(user_emb)
    item_emb = jnp.asarray(item_emb)
    rated_ids = jnp.asarray(rated_pad)
    excl = jnp.asarray(excluded)
    vals_d, ids_d, suspicious = _sweep_padded(
        user_emb, item_emb, rated_ids, excl,
        i_pad, b_pad, tile_u, block_i, k, interpret=interpret, bf16=bf16,
    )
    vals, ids = _torch_tie_order(np.array(vals_d), np.array(ids_d))

    def exact_chunk(rows_pad):
        rows_d = jnp.asarray(rows_pad)
        return _exact_rows(
            user_emb[rows_d],
            item_emb,
            rated_ids[rows_d].astype(jnp.int32),
            excl,
            k,
            bf16,
        )

    apply_exact_fallback(vals, ids, np.asarray(suspicious), exact_chunk)
    return vals, ids


@functools.partial(jax.jit, static_argnames=("k", "bf16"))
def _exact_rows(users_rows, items, rated_rows, excluded, k: int,
                bf16: bool = False):
    """XLA fallback for ghost-flagged rows (exact masked_topk). Under
    bf16 mode it reproduces the kernel's rounding: bf16 operands, f32
    accumulation."""
    from ...runtime.eval import masked_topk

    if bf16:
        users_rows = users_rows.astype(jnp.bfloat16)
        items = items.astype(jnp.bfloat16)
    scores = jnp.dot(
        users_rows, items.T, preferred_element_type=jnp.float32
    )
    return masked_topk(scores, rated_rows, excluded, k)
