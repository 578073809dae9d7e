"""Embedding checkpoint bus.

Rebuild of the reference's file-system checkpoint bus: warm backbones WRITE
``./emb/<ds>_cold_<obj>_<model>_{user,item}_emb.pt`` (e.g. MF.py:44-46) and
cold-start models READ ``..._{backbone}_...`` (DropoutNet.py:95-100, ...).

Here tensors are stored as ``.npz`` archives (numpy, framework-neutral) with
named arrays, one file per (dataset, cold_object, model) triple:
``<emb_dir>/<ds>_cold_<obj>_<model>_emb.npz`` containing at least
``user_emb`` and ``item_emb``; models may add extra tensors (VBPR saves its
projection W, VBPR.py:49-54, which AMR requires verbatim, AMR.py:94-124).

Reference ``.pt`` interop (round 4): the reference writes one
``torch.save`` file PER tensor named ``<ds>_cold_<obj>_<model>_<key>.pt``
where ``<key>`` matches our npz tensor keys exactly (``user_emb``/
``item_emb`` everywhere, plus VBPR's ``user_emb_main_P``/``item_emb_main_Q``/
``user_emb_aux``/``item_emb_aux``/``W``, GoRec's ``cluster_label``, ALDI's
``warm_user_emb``/``cold_user_emb``). :func:`load_embeddings` falls back to
reading those files when the npz is absent, so backbones trained by the
UNMODIFIED reference are directly consumable; ``fmt="pt"``/``"both"`` on
:func:`save_embeddings` exports the reverse direction so reference cold
models can consume backbones trained here.
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


def _pt_prefix(emb_dir: str, dataset: str, cold_object: str, model: str) -> str:
    return os.path.join(emb_dir, f"{dataset}_cold_{cold_object}_{model}_")


def _load_pt_tensor(path: str) -> np.ndarray:
    import torch

    try:
        t = torch.load(path, map_location="cpu")
    except Exception:
        # newer torch defaults weights_only=True, which rejects Parameters
        # saved by some torch versions; these are local bus artifacts
        t = torch.load(path, map_location="cpu", weights_only=False)
    return t.detach().cpu().numpy()


def save_embeddings(
    emb_dir: str,
    dataset: str,
    cold_object: str,
    model: str,
    tensors: Dict[str, np.ndarray],
    fmt: str = "npz",
) -> str:
    """Write the bus artifact. ``fmt``: "npz" (native), "pt" (the
    reference's per-tensor torch.save layout, e.g. MF.py:44-46 — lets the
    UNMODIFIED reference's cold models consume backbones trained here), or
    "both"."""
    os.makedirs(emb_dir, exist_ok=True)
    path = _path(emb_dir, dataset, cold_object, model)
    if fmt not in ("npz", "pt", "both"):
        raise ValueError(f"unknown emb format {fmt!r} (npz|pt|both)")
    if fmt in ("npz", "both"):
        np.savez(path, **{k: np.asarray(v) for k, v in tensors.items()})
    if fmt in ("pt", "both"):
        import torch

        prefix = _pt_prefix(emb_dir, dataset, cold_object, model)
        for k, v in tensors.items():
            # np.array copy: torch warns on (and may alias) non-writable views
            torch.save(torch.from_numpy(np.array(v)), f"{prefix}{k}.pt")
    if fmt == "pt" and os.path.exists(path):
        # a stale npz from an earlier run would shadow this fresh export
        # (load_embeddings prefers the npz) — remove it so the bus serves
        # the tensors just written
        os.remove(path)
    return path if fmt != "pt" else _pt_prefix(
        emb_dir, dataset, cold_object, model
    )


def load_embeddings(
    emb_dir: str,
    dataset: str,
    cold_object: str,
    model: str,
    required: Optional[tuple] = ("user_emb", "item_emb"),
) -> Dict[str, np.ndarray]:
    path = _path(emb_dir, dataset, cold_object, model)
    if os.path.exists(path):
        with np.load(path) as z:
            out = {k: z[k] for k in z.files}
    else:
        # reference-artifact fallback: one torch.save file per tensor
        # (MF.py:44-46, VBPR.py:49-54, GoRec.py:76-78, ALDI.py:113-121)
        prefix = _pt_prefix(emb_dir, dataset, cold_object, model)
        import glob as _glob

        out = {
            os.path.basename(p)[len(os.path.basename(prefix)):-3]:
                _load_pt_tensor(p)
            for p in sorted(_glob.glob(prefix + "*.pt"))
        }
        if not out:
            raise FileNotFoundError(
                f"backbone checkpoint not found: {path} (and no reference "
                f"{os.path.basename(prefix)}*.pt files). Train the backbone "
                f"first (e.g. `python main.py --model {model} --dataset "
                f"{dataset} --cold_object {cold_object}`)."
            )
    if required:
        missing = [k for k in required if k not in out]
        if missing:
            raise KeyError(f"checkpoint {path} missing tensors {missing}")
    return out
