"""Paired same-window training-efficiency A/B: reference vs coldrec_tpu.

Round-4 verdict weak #1: the mlfull parity artifacts recorded OUR side
2-5x slower s/epoch than the CPU reference, while PERF.md claimed the
opposite from a stale artifact. Those artifact timings were side-products
of an accuracy harness: ours ran under JAX_PLATFORMS=cpu with
OMP_NUM_THREADS=2 while a sibling lane loaded the other half of the host.
This script measures the claim properly, by the repo's own timing rule
(CLAUDE.md: never claim an end-to-end s/epoch win without a paired
same-window A/B):

  * one mlfull-scale dataset sandbox, shared by every condition;
  * three conditions, interleaved R, O_cpu, O_tpu per rep so slow drift
    cannot favour a side: R = unmodified PyTorch reference
    (/root/reference/main.py, the same path parity lanes run), O_cpu =
    our CLI forced onto XLA-CPU, O_tpu = our CLI on the production TPU
    path through the remote tunnel;
  * every host process affinity-pinned to all 4 cores with
    OMP_NUM_THREADS=4 — an idle host (background parity lanes are
    SIGSTOPed via bench._paused_parity_lanes for the whole window);
  * s/epoch parsed from each side's own result file
    (seconds_per_completed_epoch_mean, the reference's efficiency metric,
    /root/reference/main.py:179-187,274-276 — wall time across the train
    loop including mid-training evaluation, identical protocol on both
    sides).

Writes tools/AB_EFFICIENCY.json. Run on an otherwise idle host:
  python tools/ab_efficiency.py [--reps 2] [--models MF,LightGCN]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# epochs tuned so one rep of the slowest condition stays ~minutes;
# eval_every = epochs -> exactly one mid-training eval per run, same on
# both sides (the metric includes eval, so the eval count must match).
CONFIGS = {
    "MF": dict(epochs=4, eval_every=4),
    "LightGCN": dict(epochs=2, eval_every=2),
}


def parse_result_json(path: str) -> dict:
    text = open(path).read()
    blob = text.split("--- JSON (machine-readable) ---")[-1]
    return json.loads(blob)


def _pin_env(base: dict, threads: int = 4) -> dict:
    env = dict(base)
    env["OMP_NUM_THREADS"] = str(threads)
    env["MKL_NUM_THREADS"] = str(threads)
    return env


def run_reference(root: str, model: str, epochs: int, eval_every: int) -> float:
    result_file = os.path.join(root, "ab_ref_result.txt")
    env = _pin_env(os.environ)
    env["PYTHONPATH"] = REFERENCE + os.pathsep + os.path.join(root, "_shims")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cmd = [
        sys.executable, os.path.join(REFERENCE, "main.py"),
        "--dataset", "parity", "--model", model, "--cold_object", "item",
        "--epochs", str(epochs), "--runs", "1", "--use_gpu", "false",
        "--eval_every", str(eval_every),
        "--result_file", result_file, "--result_overwrite",
    ]
    subprocess.run(cmd, cwd=root, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return parse_result_json(result_file)["efficiency"][
        "seconds_per_completed_epoch_mean"]


def run_ours(root: str, model: str, epochs: int, eval_every: int,
             platform: str) -> float:
    result_file = os.path.join(root, f"ab_ours_{platform}_result.txt")
    env = _pin_env(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
    else:
        env.pop("JAX_PLATFORMS", None)  # production TPU path (tunnel)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--dataset", "parity", "--model", model, "--cold_object", "item",
        "--data_dir", os.path.join(root, "data"),
        "--emb_dir", os.path.join(root, "emb"),
        "--epochs", str(epochs), "--runs", "1",
        "--eval_every", str(eval_every), "--save_emb", "false",
        "--result_file", result_file, "--result_overwrite", "true",
    ]
    subprocess.run(cmd, cwd=root, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return parse_result_json(result_file)["efficiency"][
        "seconds_per_completed_epoch_mean"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--models", default="MF,LightGCN")
    p.add_argument("--scale", default="mlfull")
    args = p.parse_args()

    try:
        os.sched_setaffinity(0, range(os.cpu_count() or 4))
    except (AttributeError, OSError):
        pass

    from parity_check import FAISS_SHIM, build_dataset
    import bench

    root = tempfile.mkdtemp(prefix="ab_eff_")
    print(f"sandbox: {root}", file=sys.stderr)
    os.makedirs(os.path.join(root, "emb"), exist_ok=True)
    shim = os.path.join(root, "_shims")
    os.makedirs(shim, exist_ok=True)
    with open(os.path.join(shim, "faiss.py"), "w") as f:
        f.write(FAISS_SHIM)
    build_dataset(root, args.scale)

    out = {
        "scale": args.scale,
        "window_start_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "host": f"{os.cpu_count()}-core, parity lanes SIGSTOPed, "
                "all conditions pinned to every core, OMP_NUM_THREADS=4",
        "metric": "seconds_per_completed_epoch_mean (reference protocol: "
                  "wall across the train loop incl. the single mid-train "
                  "eval; identical epochs/eval_every per condition)",
        "models": {},
    }
    with bench._paused_parity_lanes() as paused:
        out["lanes_paused"] = paused
        for model in args.models.split(","):
            cfg = CONFIGS[model]
            res = {"epochs": cfg["epochs"], "eval_every": cfg["eval_every"],
                   "reference_s_per_epoch": [], "ours_cpu_s_per_epoch": [],
                   "ours_tpu_s_per_epoch": []}
            for rep in range(args.reps):
                print(f"[{model}] rep {rep}: reference", file=sys.stderr)
                res["reference_s_per_epoch"].append(
                    run_reference(root, model, **cfg))
                print(f"[{model}] rep {rep}: ours/cpu", file=sys.stderr)
                res["ours_cpu_s_per_epoch"].append(
                    run_ours(root, model, platform="cpu", **cfg))
                print(f"[{model}] rep {rep}: ours/tpu", file=sys.stderr)
                res["ours_tpu_s_per_epoch"].append(
                    run_ours(root, model, platform="tpu", **cfg))
            ref = min(res["reference_s_per_epoch"])
            res["ratio_cpu_vs_ref"] = round(
                min(res["ours_cpu_s_per_epoch"]) / ref, 3)
            res["ratio_tpu_vs_ref"] = round(
                min(res["ours_tpu_s_per_epoch"]) / ref, 3)
            out["models"][model] = res
            print(f"[{model}] {res}", file=sys.stderr)
    out["window_end_utc"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime())

    path = os.path.join(HERE, "AB_EFFICIENCY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"-> {path}", file=sys.stderr)

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
