"""Checkpoint-bus interchange with the reference's ``.pt`` artifacts.

The reference bus is one ``torch.save`` file per tensor
(``<ds>_cold_<obj>_<model>_<key>.pt`` — MF.py:44-46, VBPR.py:49-54);
ours is a single npz. Round-3 VERDICT flagged the boundary as blocking
direct artifact interchange; these tests pin both directions:

  * ``load_embeddings`` falls back to reading reference ``.pt`` files when
    the npz is absent (keys = filename suffixes, identical to npz keys);
  * ``save_embeddings(fmt="pt")`` exports the reference layout, and the
    UNMODIFIED reference's GAR consumes a backbone trained HERE;
  * a reference-trained MF backbone (real subprocess run) feeds our
    DropoutNet end to end.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def test_pt_roundtrip_unit(tmp_path):
    import torch

    from coldrec_tpu.runtime.checkpoints import load_embeddings, save_embeddings

    tensors = {
        "user_emb": np.random.default_rng(0).standard_normal((7, 4)).astype(
            np.float32
        ),
        "item_emb": np.random.default_rng(1).standard_normal((5, 4)).astype(
            np.float32
        ),
        "W": np.random.default_rng(2).standard_normal((3, 4)).astype(np.float32),
        "cluster_label": np.arange(5, dtype=np.int64),
    }
    save_embeddings(str(tmp_path), "ds", "item", "MF", tensors, fmt="pt")
    # only .pt files exist (reference layout, one file per tensor)
    files = sorted(os.listdir(tmp_path))
    assert files == [
        "ds_cold_item_MF_W.pt",
        "ds_cold_item_MF_cluster_label.pt",
        "ds_cold_item_MF_item_emb.pt",
        "ds_cold_item_MF_user_emb.pt",
    ]
    # the files are plain torch tensors the reference can load
    t = torch.load(str(tmp_path / "ds_cold_item_MF_user_emb.pt"),
                   map_location="cpu")
    np.testing.assert_array_equal(t.numpy(), tensors["user_emb"])
    out = load_embeddings(str(tmp_path), "ds", "item", "MF",
                          required=("user_emb", "item_emb", "W"))
    for k, v in tensors.items():
        np.testing.assert_array_equal(out[k], v)


def test_pt_fallback_prefers_npz(tmp_path):
    from coldrec_tpu.runtime.checkpoints import load_embeddings, save_embeddings

    a = {"user_emb": np.ones((2, 3), np.float32),
         "item_emb": np.ones((2, 3), np.float32)}
    b = {"user_emb": 2 * np.ones((2, 3), np.float32),
         "item_emb": 2 * np.ones((2, 3), np.float32)}
    save_embeddings(str(tmp_path), "ds", "item", "MF", a, fmt="pt")
    save_embeddings(str(tmp_path), "ds", "item", "MF", b, fmt="npz")
    out = load_embeddings(str(tmp_path), "ds", "item", "MF")
    np.testing.assert_array_equal(out["user_emb"], b["user_emb"])


def test_pt_export_removes_stale_npz(tmp_path):
    """fmt='pt' after an older npz: the stale npz must not shadow the
    fresh export (load_embeddings prefers the npz when present)."""
    from coldrec_tpu.runtime.checkpoints import load_embeddings, save_embeddings

    a = {"user_emb": np.ones((2, 3), np.float32),
         "item_emb": np.ones((2, 3), np.float32)}
    b = {"user_emb": 2 * np.ones((2, 3), np.float32),
         "item_emb": 2 * np.ones((2, 3), np.float32)}
    save_embeddings(str(tmp_path), "ds", "item", "MF", a, fmt="npz")
    save_embeddings(str(tmp_path), "ds", "item", "MF", b, fmt="pt")
    out = load_embeddings(str(tmp_path), "ds", "item", "MF")
    np.testing.assert_array_equal(out["user_emb"], b["user_emb"])


def test_missing_both_raises(tmp_path):
    from coldrec_tpu.runtime.checkpoints import load_embeddings

    with pytest.raises(FileNotFoundError, match="no reference"):
        load_embeddings(str(tmp_path), "ds", "item", "MF")


@pytest.fixture(scope="module")
def interop_sandbox(tmp_path_factory):
    """Tiny shared dataset in the reference's file layout."""
    from parity_check import build_dataset

    root = str(tmp_path_factory.mktemp("pt_interop"))
    build_dataset(root, "small")
    os.makedirs(os.path.join(root, "emb"), exist_ok=True)
    return root


@needs_reference
def test_reference_pt_feeds_our_cold_model(interop_sandbox):
    """Reference-trained MF .pt artifacts -> our DropoutNet, end to end."""
    from parity_check import run_ours, run_reference

    root = interop_sandbox
    run_reference(root, "MF", epochs=3, runs=1)
    emb = os.path.join(root, "emb")
    assert os.path.exists(
        os.path.join(emb, "parity_cold_item_MF_user_emb.pt")
    )
    assert not os.path.exists(
        os.path.join(emb, "parity_cold_item_MF_emb.npz")
    )
    res = run_ours(root, "DropoutNet", epochs=2, runs=1)
    ndcg = res["metrics"]["20"]["all"]["NDCG"]["mean"]
    assert np.isfinite(ndcg) and ndcg > 0


@needs_reference
def test_our_pt_export_feeds_reference_gar(interop_sandbox):
    """Our MF with --save_emb_format pt -> the UNMODIFIED reference's GAR."""
    from parity_check import run_ours, run_reference

    root = interop_sandbox
    emb = os.path.join(root, "emb")
    # the previous test left REFERENCE-written MF .pt files in the shared
    # sandbox; delete them so a broken export cannot hide behind leftovers
    # (the exists-assert below must see OUR files, not theirs)
    for side in ("user", "item"):
        p = os.path.join(emb, f"parity_cold_item_MF_{side}_emb.pt")
        if os.path.exists(p):
            os.remove(p)
    run_ours(root, "MF", epochs=3, runs=1,
             extra_args={"save_emb_format": "pt"})
    # our export created the reference-layout files
    assert os.path.exists(
        os.path.join(emb, "parity_cold_item_MF_item_emb.pt")
    )
    ref = run_reference(root, "GAR", epochs=2, runs=1)
    ndcg = ref["metrics"]["20"]["all"]["NDCG"]["mean"]
    assert np.isfinite(ndcg) and ndcg > 0
