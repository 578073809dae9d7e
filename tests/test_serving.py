"""RetrievalServer: checkpoint-bus loading, exactness vs the eval sweep,
raw-id round trips, and the mesh-sharded path.

The reference's only inference API is predict/batch_predict on the live
trainer (BaseRecommender.py:63-107); the server must reproduce the SAME
ranked lists as the offline eval path (masked_topk / the fused kernel)
under identical masks, so a consumer can switch between offline eval and
online serving without rank drift.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.runtime.checkpoints import save_embeddings
from coldrec_tpu.runtime.eval import mask_bias_vector, masked_topk
from coldrec_tpu.runtime.serving import RetrievalServer

K = 7
D = 16


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    data, _ = synthetic_dataset(
        n_users=80, n_items=300, n_inter=2500, cold_object="item", seed=11
    )
    rng = np.random.default_rng(3)
    ue = rng.standard_normal((data.user_num, D)).astype(np.float32)
    ie = rng.standard_normal((data.item_num, D)).astype(np.float32)
    emb_dir = str(tmp_path_factory.mktemp("emb"))
    save_embeddings(emb_dir, "synth", "item", "MF",
                    {"user_emb": ue, "item_emb": ie})
    return data, ue, ie, emb_dir


def _oracle(data, ue, ie, uids, k, exclude_rated=True, exclude_items=None):
    rated = (
        data.rated_padded(uids.astype(np.int32))
        if exclude_rated
        else np.full((len(uids), 1), data.item_num, np.int32)
    )
    bias = mask_bias_vector(data.item_num, exclude_items)
    scores = jnp.asarray(ue[uids]) @ jnp.asarray(ie).T
    v, i = masked_topk(scores, jnp.asarray(rated), jnp.asarray(bias), k)
    return np.asarray(v), np.asarray(i)


def test_topk_matches_eval_path(setup, rng):
    data, ue, ie, emb_dir = setup
    srv = RetrievalServer.from_checkpoint(
        emb_dir, "synth", "item", "MF", dataset=data
    )
    uids = rng.integers(0, data.user_num, 33).astype(np.int32)
    vals, ids = srv.topk(uids, K)
    ov, oi = _oracle(data, ue, ie, uids, K)
    np.testing.assert_allclose(vals, ov, rtol=1e-5)
    np.testing.assert_array_equal(ids, oi)
    # rated items really are excluded
    for r, u in enumerate(uids):
        assert not set(ids[r]) & set(data.user_rated_slice(int(u)).tolist())


def test_no_rated_exclusion_and_candidate_mask(setup, rng):
    data, ue, ie, emb_dir = setup
    banned = np.arange(0, data.item_num, 3)
    srv = RetrievalServer(ue, ie, dataset=data, exclude_items=banned)
    uids = rng.integers(0, data.user_num, 16).astype(np.int32)
    vals, ids = srv.topk(uids, K, exclude_rated=False)
    ov, oi = _oracle(
        data, ue, ie, uids, K, exclude_rated=False, exclude_items=banned
    )
    np.testing.assert_array_equal(ids, oi)
    assert not set(ids.ravel().tolist()) & set(banned.tolist())


def test_raw_id_round_trip(setup):
    data, ue, ie, emb_dir = setup
    srv = RetrievalServer(ue, ie, dataset=data)
    raw_users = data.id2user[np.array([0, 5, 17])]
    _, raw_items = srv.topk(raw_users, K, raw_ids=True)
    _, mapped = srv.topk(np.array([0, 5, 17]), K)
    np.testing.assert_array_equal(raw_items, data.id2item[mapped])


def test_mesh_sharded_serving_matches_single(setup, rng):
    from coldrec_tpu.parallel.mesh import make_mesh

    data, ue, ie, emb_dir = setup
    assert len(jax.devices()) >= 8
    mesh = make_mesh(1, 8)
    srv_s = RetrievalServer(ue, ie, dataset=data, mesh=mesh)
    srv_1 = RetrievalServer(ue, ie, dataset=data)
    uids = rng.integers(0, data.user_num, 24).astype(np.int32)
    vs, is_ = srv_s.topk(uids, K)
    v1, i1 = srv_1.topk(uids, K)
    np.testing.assert_allclose(vs, v1, rtol=1e-5)
    np.testing.assert_array_equal(is_, i1)


def test_cold_model_bus_artifact_serves_trainer_lists(tmp_path):
    """End-to-end guarantee for the primary serving use case: the bus
    artifact a cold model writes (cold-patched best tables) must serve the
    SAME ranked lists the live trainer produced for its cold-setting test —
    i.e. offline eval and online serving are interchangeable views of one
    model (reference: only the live trainer can answer queries,
    BaseRecommender.py:63-107)."""
    from coldrec_tpu.config import default_args
    from coldrec_tpu.models import model_factory
    from coldrec_tpu.runtime.trainer import Config

    data, _ = synthetic_dataset(
        n_users=90, n_items=110, n_inter=2200, cold_object="item",
        content_dim=12, seed=23,
    )
    emb_dir = str(tmp_path)
    bb = default_args(model="MF", dataset="synth", epochs=3, bs=512,
                      emb_size=16, early_stop=5, emb_dir=emb_dir, seed=7)
    model_factory(Config(bb, data)).run()
    args = default_args(model="GAR", dataset="synth", epochs=2, bs=256,
                        emb_size=16, early_stop=5, emb_dir=emb_dir, seed=5,
                        save_emb=True)
    model = model_factory(Config(args, data))
    model.run()
    rec_trainer = model.test("cold")

    srv = RetrievalServer.from_checkpoint(
        emb_dir, "synth", "item", "GAR", dataset=data,
        exclude_items=data.candidate_mask("item", "cold"),
    )
    users = data.eval_splits["cold_test"].users.astype(np.int32)
    _, ids = srv.topk(users, model.max_N)
    np.testing.assert_array_equal(ids, rec_trainer)
