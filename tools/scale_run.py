"""Reference-scale end-to-end timing driver (VERDICT r1 task 9 / r2 task 4).

Generates a synthetic dataset at a reference-published shape — ``--shape
bx`` (book-crossing: ~92k x 270k, ~1.03M interactions — the widest item
axis) or ``--shape xing`` (XING: ~107k x 20.5k, ~3.86M interactions,
content dim 2,738 — the heaviest nnz and content width;
/root/reference/data/README.md) — writes it in the reference file layout,
then times a full ``main.py`` run (train + 3-way eval) for the requested
model on the real chip.

Cold-start models need a warm backbone artifact on the npz bus; pass
``--make_backbone`` (or it is auto-detected as missing) and the script
first runs the backbone with ``--save_emb 1``.

Usage::

    python tools/scale_run.py --model MF   --epochs 2
    python tools/scale_run.py --model CGRC --epochs 1
    python tools/scale_run.py --model CCFCRec --epochs 1 --shape xing

The dataset is cached under ``tools/<shape>_workdir/`` across invocations
(delete the directory to regenerate).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Shape targets from the reference's published dataset table
# (/root/reference/data/README.md:9-11 / SURVEY §6):
#   bx   — book-crossing 92,107 x 270,170, ~1.03M interactions (the widest
#          item axis; n_inter excludes the user/item appearance guarantees)
#   xing — XING 106,881 x 20,519, 3,856,580 interactions, item content dim
#          2,738: 3.7x the nnz of bx (stresses sampler / ELL build / graph
#          SpMM) and 6.6x the content width (stresses every content-MLP
#          first layer and attribute attention)
SHAPES = {
    "bx": dict(
        n_users=92_107, n_items=270_170, n_inter=675_000, content_dim=64
    ),
    "xing": dict(
        n_users=106_881, n_items=20_519, n_inter=4_400_000, content_dim=2_738
    ),
}
def _set_shape(shape: str) -> None:
    global SHAPE, WORKDIR, N_USERS, N_ITEMS, N_INTER, CONTENT_DIM, DATASET
    SHAPE = shape
    WORKDIR = os.path.join(REPO, "tools", f"{shape}_workdir")
    N_USERS = SHAPES[shape]["n_users"]
    N_ITEMS = SHAPES[shape]["n_items"]
    N_INTER = SHAPES[shape]["n_inter"]
    CONTENT_DIM = SHAPES[shape]["content_dim"]
    DATASET = shape


_set_shape(os.environ.get("SCALE_SHAPE", "bx"))

# Warm-backbone models: anything else needs a backbone artifact first.
WARM = {"MF", "NGCF", "LightGCN", "NCL", "SimGCL", "XSimGCL"}


def build_dataset(cold_object: str = "item", seed: int = 7) -> None:
    from coldrec_tpu.data.split import cold_start_split, write_split_dir
    from coldrec_tpu.data.synthetic import synthetic_interactions

    marker = os.path.join(
        WORKDIR, "data", DATASET, f"cold_{cold_object}", "info_dict.pkl"
    )
    if os.path.exists(marker):
        return
    t0 = time.perf_counter()
    pairs = synthetic_interactions(N_USERS, N_ITEMS, N_INTER, seed=seed)
    res = cold_start_split(pairs, cold_object=cold_object, seed=seed + 42)
    data_dir = os.path.join(WORKDIR, "data")
    write_split_dir(res, data_dir, DATASET, cold_object)
    rng = np.random.default_rng(seed + 1)
    n_side = res.item_num if cold_object == "item" else res.user_num
    np.save(
        os.path.join(
            data_dir, DATASET, f"{DATASET}_{cold_object}_content.npy"
        ),
        rng.standard_normal((n_side, CONTENT_DIM)).astype(np.float32),
    )
    print(
        f"[scale_run] dataset built: {res.user_num} x {res.item_num}, "
        f"{len(pairs)} raw pairs, {time.perf_counter() - t0:.1f}s",
        flush=True,
    )


def run_model(model: str, epochs: int, extra: list, cold_object: str) -> dict:
    out_dir = os.path.join(WORKDIR, "results")
    os.makedirs(out_dir, exist_ok=True)
    result_file = os.path.join(out_dir, f"{model}.json")
    cmd = [
        sys.executable,
        os.path.join(REPO, "main.py"),
        "--dataset", DATASET,
        "--model", model,
        "--epochs", str(epochs),
        "--runs", "1",
        "--cold_object", cold_object,
        "--data_dir", os.path.join(WORKDIR, "data"),
        "--emb_dir", os.path.join(WORKDIR, "emb"),
        "--result_dir", out_dir,
        "--result_file", result_file,
        "--result_overwrite", "1",
        *extra,
    ]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise SystemExit(f"{model} run failed rc={proc.returncode}")
    payload = {}
    if os.path.exists(result_file):
        text = open(result_file).read()
        marker = "--- JSON"
        if marker in text:
            blob = text[text.index(marker):]
            blob = blob[blob.index("{"):]
            try:
                payload = json.JSONDecoder().raw_decode(blob)[0]
            except ValueError:
                payload = {}
    print(
        json.dumps(
            {
                "scale_run": model,
                "epochs": epochs,
                "wall_seconds": round(wall, 1),
                "sec_per_epoch": payload.get("efficiency", {}).get(
                    "seconds_per_completed_epoch_mean"
                ),
            }
        ),
        flush=True,
    )
    return {"wall": wall, "payload": payload}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="CGRC")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--backbone", default="MF")
    p.add_argument("--backbone_epochs", type=int, default=2)
    p.add_argument("--cold_object", default="item")
    p.add_argument("--shape", default=SHAPE, choices=list(SHAPES))
    args, extra = p.parse_known_args()  # unknown flags forward to main.py

    _set_shape(args.shape)
    build_dataset(cold_object=args.cold_object)

    if args.model not in WARM:
        bus = os.path.join(
            WORKDIR,
            "emb",
            f"{DATASET}_cold_{args.cold_object}_{args.backbone}_emb.npz",
        )
        if not os.path.exists(bus):
            print(f"[scale_run] backbone {args.backbone} first...", flush=True)
            run_model(
                args.backbone,
                args.backbone_epochs,
                ["--save_emb", "1"],
                args.cold_object,
            )

    run_model(args.model, args.epochs, extra, args.cold_object)


if __name__ == "__main__":
    main()
