"""Pallas retrieval kernel (interpret mode on CPU) vs masked_topk oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from coldrec_tpu.ops.pallas.retrieval import SLOTS, retrieval_topk
from coldrec_tpu.runtime.eval import masked_topk


@pytest.mark.parametrize("n_items", [100, 256])
def test_retrieval_matches_masked_topk(rng, n_items):
    n_users, d, k = 40, 16, 10
    ue = rng.standard_normal((n_users, d)).astype(np.float32)
    ie = rng.standard_normal((n_items, d)).astype(np.float32)
    max_rated = 12
    rated = np.full((n_users, max_rated), n_items, dtype=np.int32)
    for u in range(n_users):
        nr = rng.integers(0, max_rated)
        rated[u, :nr] = rng.choice(n_items, nr, replace=False)
    excluded = np.zeros(n_items, dtype=bool)
    excluded[rng.choice(n_items, n_items // 4, replace=False)] = True

    vals, ids = retrieval_topk(
        ue, ie, rated, excluded, k, tile_u=16, block_i=128, interpret=True
    )

    scores = jnp.asarray(ue) @ jnp.asarray(ie).T
    ref_vals, ref_ids = masked_topk(
        scores, jnp.asarray(rated), jnp.asarray(excluded), k
    )
    np.testing.assert_allclose(vals, np.asarray(ref_vals), rtol=1e-4, atol=1e-4)
    # indices may differ only where scores tie; compare via score values
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(scores), ids, axis=1),
        np.take_along_axis(np.asarray(scores), np.asarray(ref_ids), axis=1),
        rtol=1e-4, atol=1e-4,
    )
    # no excluded or rated items in the result
    for u in range(n_users):
        got = set(ids[u].tolist())
        assert not (got & set(np.where(excluded)[0].tolist()))
        assert not (got & set(rated[u][rated[u] < n_items].tolist()))


def test_knn_via_retrieval_matches_blocked_topk(rng):
    """ops/knn.py TPU path: unmasked kNN through the fused kernel (with
    contraction-dim padding for non-lane-multiple content dims) must
    match the blocked matmul+top_k oracle."""
    from coldrec_tpu.ops.knn import _knn_via_retrieval, _topk_chunk

    n_q, n_v, d, k = 30, 300, 20, 7  # d deliberately not a lane multiple
    q = rng.standard_normal((n_q, d)).astype(np.float32)
    v = rng.standard_normal((n_v, d)).astype(np.float32)
    vals, ids = _knn_via_retrieval(q, v, k, interpret=True)
    ref_vals, ref_ids = _topk_chunk(jnp.asarray(q), jnp.asarray(v), k)
    np.testing.assert_allclose(vals, np.asarray(ref_vals), rtol=1e-5, atol=1e-5)
    scores = q @ v.T
    np.testing.assert_allclose(
        np.take_along_axis(scores, ids, axis=1),
        np.take_along_axis(scores, np.asarray(ref_ids), axis=1),
        rtol=1e-5, atol=1e-5,
    )


def test_bf16_mode_matches_bf16_oracle(rng):
    """--eval_backend pallas_bf16: the kernel must return the exact top-k
    of the bf16-rounded scores (bf16 operands, f32 accumulate)."""
    n_users, n_items, d, k = 32, 384, 16, 8
    ue = rng.standard_normal((n_users, d)).astype(np.float32)
    ie = rng.standard_normal((n_items, d)).astype(np.float32)
    max_rated = 8
    rated = np.full((n_users, max_rated), n_items, dtype=np.int32)
    for u in range(n_users):
        nr = rng.integers(0, max_rated)
        rated[u, :nr] = rng.choice(n_items, nr, replace=False)
    excluded = np.zeros(n_items, dtype=bool)
    excluded[rng.choice(n_items, n_items // 4, replace=False)] = True

    vals, ids = retrieval_topk(
        ue, ie, rated, excluded, k,
        tile_u=16, block_i=128, interpret=True, bf16=True,
    )
    scores = jnp.dot(
        jnp.asarray(ue).astype(jnp.bfloat16),
        jnp.asarray(ie).astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    ref_vals, ref_ids = masked_topk(
        scores, jnp.asarray(rated), jnp.asarray(excluded), k
    )
    np.testing.assert_array_equal(vals, np.asarray(ref_vals))
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(scores), ids, axis=1),
        np.take_along_axis(np.asarray(scores), np.asarray(ref_ids), axis=1),
    )
    for u in range(n_users):
        got = set(ids[u].tolist())
        assert not (got & set(np.where(excluded)[0].tolist()))
        assert not (got & set(rated[u][rated[u] < n_items].tolist()))


def test_high_scoring_rated_items_rejected(rng):
    """Rated items are NOT masked in-kernel (overfetch-then-reject); they
    must still never surface even when they dominate the score scale."""
    n_items, d, k = 512, 16, 10
    ue = np.zeros((4, d), dtype=np.float32)
    ue[:, 0] = 1.0
    ie = rng.standard_normal((n_items, d)).astype(np.float32) * 0.01
    hot = rng.choice(n_items, 24, replace=False).astype(np.int32)
    ie[hot, 0] = 50.0  # rated items score far above everything else
    rated = np.tile(np.sort(hot), (4, 1)).astype(np.int32)
    excluded = np.zeros(n_items, dtype=bool)
    vals, ids = retrieval_topk(
        ue, ie, rated, excluded, k, tile_u=4, block_i=128, interpret=True
    )
    scores = jnp.asarray(ue) @ jnp.asarray(ie).T
    ref_vals, _ = masked_topk(
        scores, jnp.asarray(rated), jnp.asarray(excluded), k
    )
    np.testing.assert_allclose(vals, np.asarray(ref_vals), rtol=1e-4, atol=1e-5)
    assert not (set(ids.ravel().tolist()) & set(hot.tolist()))


def test_all_tie_scores_route_through_fallback(rng):
    """Degenerate case: all candidate scores identical (SimGCL's ego-free
    layer mean gives isolated cold items exactly-zero embeddings). The
    ghost test fires for every row; the chunked fallback must return the
    torch tie order (lowest index first) for parity."""
    n_users, n_items, d, k = 24, 512, 8, 10
    ue = rng.standard_normal((n_users, d)).astype(np.float32)
    ie = np.zeros((n_items, d), dtype=np.float32)  # all scores tie at 0
    rated = np.full((n_users, 4), n_items, dtype=np.int32)
    excluded = np.zeros(n_items, dtype=bool)
    excluded[rng.choice(n_items, n_items // 2, replace=False)] = True
    vals, ids = retrieval_topk(
        ue, ie, rated, excluded, k, tile_u=8, block_i=128, interpret=True
    )
    ref_vals, ref_ids = masked_topk(
        jnp.asarray(ue @ ie.T), jnp.asarray(rated), jnp.asarray(excluded), k
    )
    np.testing.assert_array_equal(vals, np.asarray(ref_vals))
    np.testing.assert_array_equal(ids, np.asarray(ref_ids))


def test_apply_exact_fallback_chunk_boundaries(rng):
    """The shared chunked-fallback helper must scatter exact results back
    correctly across chunk boundaries (incl. a padded tail chunk)."""
    from coldrec_tpu.ops.pallas.retrieval import apply_exact_fallback

    n, k, chunk = 30, 4, 8
    vals = np.zeros((n, k), np.float32)
    ids = np.zeros((n, k), np.int32)
    sus = np.zeros(n, bool)
    flagged = rng.choice(n, 20, replace=False)
    sus[flagged] = True
    calls = []

    def exact_chunk(rows_pad):
        calls.append(rows_pad.copy())
        # deterministic per-row payload keyed on the row id
        fv = np.repeat(rows_pad[:, None], k, 1).astype(np.float32) + 0.5
        fi = np.repeat(rows_pad[:, None], k, 1).astype(np.int32) * 10
        return fv, fi

    apply_exact_fallback(vals, ids, sus, exact_chunk, chunk=chunk)
    assert len(calls) == 3  # 20 flagged -> pad to 24 -> 3 chunks of 8
    for r in np.flatnonzero(sus):
        np.testing.assert_array_equal(vals[r], np.full(k, r + 0.5))
        np.testing.assert_array_equal(ids[r], np.full(k, r * 10))
    for r in np.flatnonzero(~sus):
        np.testing.assert_array_equal(vals[r], np.zeros(k))


def test_lane_collision_triggers_exact_fallback(rng):
    """>SLOTS of the true top-k in one mod-128 lane class: the ghost bound
    must flag the user and the fallback must return the exact top-k."""
    n_items, d, k = 2048, 16, SLOTS + 4
    n_plant = SLOTS + 2  # overflows the running per-lane list -> eviction
    ue = np.zeros((8, d), dtype=np.float32)
    ue[:, 0] = 1.0
    ie = rng.standard_normal((n_items, d)).astype(np.float32) * 0.01
    # plant items in lane class 0 (ids 0, 128, ...) as the global top set
    plant = [iid for iid in range(0, n_plant * 128, 128)]
    for rank, iid in enumerate(plant):
        ie[iid] = 0.0
        ie[iid, 0] = 100.0 - rank
    rated = np.full((8, 4), n_items, dtype=np.int32)
    excluded = np.zeros(n_items, dtype=bool)
    vals, ids = retrieval_topk(
        ue, ie, rated, excluded, k, tile_u=8, block_i=256, interpret=True
    )
    scores = jnp.asarray(ue) @ jnp.asarray(ie).T
    ref_vals, ref_ids = masked_topk(
        scores, jnp.asarray(rated), jnp.asarray(excluded), k
    )
    np.testing.assert_allclose(vals, np.asarray(ref_vals), rtol=1e-5)
    # the planted top set shares a lane class; only exact fallback finds it
    assert set(ids[0, :n_plant].tolist()) == set(plant)


def test_default_block_i_vmem_d_cap():
    """The (d, block_i) item window is double-buffered against the scoped
    VMEM budget (8 * d * block_i <= ~8 MB), so wider-d sweeps must shrink
    the block — XING's 2,738-dim content KNN OOM'd VMEM at the fixed 8192
    before the cap (round-3 fix). Embedding widths keep the measured
    optimum untouched."""
    from coldrec_tpu.ops.pallas.retrieval import LANES, default_block_i

    # embedding widths: measured-optimal 8192 (or the rounded item count)
    assert default_block_i(270_336, d=64) == 8192
    assert default_block_i(270_336, d=128) == 8192
    assert default_block_i(3_000, d=64) == 4096  # round_up(I, 2048)
    for d in (256, 2312, 2738, 3469):  # content-KNN widths
        b = default_block_i(270_336, d=d)
        assert b % LANES == 0 and b >= LANES
        assert 8 * d * b <= 8 * 1024 * 1024 + 8 * d * LANES  # cap honoured
