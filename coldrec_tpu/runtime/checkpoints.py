"""Embedding checkpoint bus.

Rebuild of the reference's file-system checkpoint bus: warm backbones WRITE
``./emb/<ds>_cold_<obj>_<model>_{user,item}_emb.pt`` (e.g. MF.py:44-46) and
cold-start models READ ``..._{backbone}_...`` (DropoutNet.py:95-100, ...).

Here tensors are stored as ``.npz`` archives (numpy, framework-neutral) with
named arrays, one file per (dataset, cold_object, model) triple:
``<emb_dir>/<ds>_cold_<obj>_<model>_emb.npz`` containing at least
``user_emb`` and ``item_emb``; models may add extra tensors (VBPR saves its
projection W, VBPR.py:49-54, which AMR requires verbatim, AMR.py:94-124).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def save_train_state(path: str, state: Dict) -> str:
    """Mid-training checkpoint (params, opt state, RNG, early-stop state).

    The reference has NO mid-training resume (SURVEY §5.4); this is the
    framework's preemption-recovery story. Device arrays are materialized to
    host; atomic rename so a preemption mid-write never corrupts the file.
    """
    import pickle

    import jax

    from ..parallel.distributed import localize

    # under a multi-process mesh, TP-sharded leaves are not fully
    # addressable — localize (one process_allgather) before np reads them
    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(localize(x)) if hasattr(x, "shape") else x,
        state,
    )
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f, protocol=4)
    os.replace(tmp, path)
    return path


def load_train_state(path: str) -> Optional[Dict]:
    import pickle

    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def _path(emb_dir: str, dataset: str, cold_object: str, model: str) -> str:
    return os.path.join(emb_dir, f"{dataset}_cold_{cold_object}_{model}_emb.npz")


def save_embeddings(
    emb_dir: str,
    dataset: str,
    cold_object: str,
    model: str,
    tensors: Dict[str, np.ndarray],
) -> str:
    os.makedirs(emb_dir, exist_ok=True)
    path = _path(emb_dir, dataset, cold_object, model)
    np.savez(path, **{k: np.asarray(v) for k, v in tensors.items()})
    return path


def load_embeddings(
    emb_dir: str,
    dataset: str,
    cold_object: str,
    model: str,
    required: Optional[tuple] = ("user_emb", "item_emb"),
) -> Dict[str, np.ndarray]:
    path = _path(emb_dir, dataset, cold_object, model)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"backbone checkpoint not found: {path}. Train the backbone first "
            f"(e.g. `python main.py --model {model} --dataset {dataset} "
            f"--cold_object {cold_object}`)."
        )
    with np.load(path) as z:
        out = {k: z[k] for k in z.files}
    if required:
        missing = [k for k in required if k not in out]
        if missing:
            raise KeyError(f"checkpoint {path} missing tensors {missing}")
    return out
