"""Parity harness: PyTorch reference vs coldrec_tpu on one shared dataset.

The BASELINE north star is cold/warm/overall Recall@20 & NDCG@20 parity with
the reference within run-to-run variance. The reference publishes no numbers
(BASELINE.md), so this harness measures them: it writes one synthetic
dataset in the reference's file layout, runs the UNMODIFIED reference
(subprocess, cwd = sandbox, PYTHONPATH = /root/reference) and our CLI on the
same files, and diffs the result-file JSON blocks.

Usage:
  python tools/parity_check.py [--model MF] [--epochs 30] [--runs 2]
                               [--scale small|ml]

Writes PARITY_<model>.json next to this script and prints a verdict.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"

SCALES = {
    "small": dict(n_users=300, n_items=250, n_inter=8000, content_dim=16),
    "medium": dict(n_users=1200, n_items=900, n_inter=60000, content_dim=32),
    "ml": dict(n_users=6040, n_items=3706, n_inter=400000, content_dim=64),
    # Faithful-statistics tiers (round 4): the REAL dataset statistics from
    # the reference's data/README.md:8-11 — exact interaction count (the
    # latent generator emits nnz unique pairs, no dedup loss) and the true
    # per-side content widths. Content is an informative (noisy linear)
    # view of the item/user latents, so content models' cold cells carry
    # real signal instead of being random-ranking-null draws.
    "mlfull": dict(
        n_users=6040, n_items=3706, nnz=1_000_209,
        content_dim={"item": 206, "user": 3469},
        generator="latent", min_degree=20,
    ),
    "xing": dict(
        n_users=106_881, n_items=20_519, nnz=3_856_580,
        content_dim={"item": 2738, "user": 2738},
        generator="latent", min_degree=5,
    ),
}


def _content_dim(cfg: dict, cold_object: str) -> int:
    d = cfg["content_dim"]
    return d[cold_object] if isinstance(d, dict) else d


def build_dataset(root: str, scale: str, seed: int = 11, cold_object: str = "item"):
    from coldrec_tpu.data.split import cold_start_split, write_split_dir
    from coldrec_tpu.data.synthetic import (
        latent_content, latent_interactions, synthetic_interactions,
    )

    cfg = SCALES[scale]
    if cfg.get("generator") == "latent":
        pairs, uf, vf = latent_interactions(
            cfg["n_users"], cfg["n_items"], cfg["nnz"], seed=seed,
            min_degree=cfg.get("min_degree", 5),
        )
        factors = vf if cold_object == "item" else uf
        content = latent_content(
            factors, _content_dim(cfg, cold_object), seed=seed + 1
        )
    else:
        pairs = synthetic_interactions(
            cfg["n_users"], cfg["n_items"], cfg["n_inter"], seed=seed
        )
        content = None
    res = cold_start_split(pairs, cold_object=cold_object, seed=seed + 42)
    data_dir = os.path.join(root, "data")
    write_split_dir(res, data_dir, "parity", cold_object)
    rng = np.random.default_rng(seed + 1)
    if content is None:
        n_side = res.item_num if cold_object == "item" else res.user_num
        content = rng.standard_normal(
            (n_side, _content_dim(cfg, cold_object))
        ).astype(np.float32)
    np.save(
        os.path.join(data_dir, "parity", f"parity_{cold_object}_content.npy"),
        content,
    )
    # raw csv for completeness
    with open(os.path.join(data_dir, "parity", "parity.csv"), "w") as f:
        f.write("user,item\n")
        np.savetxt(f, pairs, fmt="%d", delimiter=",")
    return res


# Functional numpy faiss shim: lets the UNMODIFIED reference run KNN
# (IndexFlatIP = exact matmul + argpartition, KNN.py:63-88) and NCL
# (Kmeans = seeded Lloyd + IndexFlatL2 assignment, NCL.py:38-55). The
# `builtins.np` injection covers NCL.py:40's use of `np` without an import
# (documented reference bug, SURVEY §7). Exactness: IndexFlatIP is exact;
# Kmeans is statistically equivalent (faiss's own clustering is seed- and
# implementation-dependent; NCL's ProtoNCE only consumes cluster structure).
FAISS_SHIM = '''\
import builtins
import numpy as np

builtins.np = np  # NCL.py uses `np` at module run_kmeans without importing it


class _FlatIndex:
    def __init__(self, d):
        self.d = int(d)
        self._chunks = []

    def add(self, x):
        self._chunks.append(np.ascontiguousarray(x, dtype=np.float32))

    @property
    def _x(self):
        return (np.concatenate(self._chunks)
                if len(self._chunks) != 1 else self._chunks[0])

    def _rank(self, scores, k):
        # top-k by score descending, exact, deterministic tie-break by index
        n = scores.shape[1]
        k = min(int(k), n)
        if k < n:
            idx = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
        else:
            idx = np.broadcast_to(np.arange(n), scores.shape).copy()
        part = np.take_along_axis(scores, idx, axis=1)
        order = np.lexsort((idx, -part), axis=1)[:, :k]
        I = np.take_along_axis(idx, order, axis=1)
        D = np.take_along_axis(part, order, axis=1)
        return D.astype(np.float32), I.astype(np.int64)


class IndexFlatIP(_FlatIndex):
    def search(self, q, k):
        q = np.asarray(q, dtype=np.float32)
        return self._rank(q @ self._x.T, k)


class IndexFlatL2(_FlatIndex):
    def search(self, q, k):
        q = np.asarray(q, dtype=np.float32)
        x = self._x
        d2 = ((q * q).sum(1)[:, None] - 2.0 * (q @ x.T)
              + (x * x).sum(1)[None, :])
        D, I = self._rank(-d2, k)
        return (-D).astype(np.float32), I


class Kmeans:
    def __init__(self, d, k, gpu=False, niter=20, seed=1234, **kw):
        self.d, self.k = int(d), int(k)
        self.niter, self.seed = int(niter), int(seed)
        self.centroids = None
        self.index = None

    def train(self, x):
        x = np.ascontiguousarray(x, dtype=np.float32)
        n = x.shape[0]
        rng = np.random.default_rng(self.seed)
        init = rng.choice(n, size=self.k, replace=n < self.k)
        c = x[init].copy()
        for _ in range(self.niter):
            d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
                  + (c * c).sum(1)[None, :])
            assign = d2.argmin(1)
            counts = np.bincount(assign, minlength=self.k)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, x)
            upd = sums / np.maximum(counts, 1)[:, None]
            c = np.where((counts == 0)[:, None], c, upd)
            empty = np.flatnonzero(counts == 0)
            if empty.size:  # faiss splits big clusters; random restart is the
                c[empty] = x[rng.choice(n, size=empty.size)]  # simple analog
        self.centroids = c.astype(np.float32)
        self.index = IndexFlatL2(self.d)
        self.index.add(self.centroids)
'''


def run_reference(root: str, model: str, epochs: int, runs: int, extra=(),
                  cold_object: str = "item", backbone: str = "MF"):
    """Run the unmodified reference CLI in a sandbox cwd."""
    os.makedirs(os.path.join(root, "emb"), exist_ok=True)
    shim = os.path.join(root, "_shims")
    os.makedirs(shim, exist_ok=True)
    with open(os.path.join(shim, "faiss.py"), "w") as f:
        f.write(FAISS_SHIM)
    result_file = os.path.join(root, "ref_result.txt")
    env = dict(os.environ)
    env["PYTHONPATH"] = REFERENCE + os.pathsep + shim
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep torch off any accelerator
    cmd = [
        sys.executable, os.path.join(REFERENCE, "main.py"),
        "--dataset", "parity", "--model", model, "--cold_object", cold_object,
        "--backbone", backbone,
        "--epochs", str(epochs), "--runs", str(runs),
        "--use_gpu", "false", "--result_file", result_file,
        "--result_overwrite", *extra,
    ]
    print("[reference]", " ".join(cmd))
    subprocess.run(cmd, cwd=root, env=env, check=True)
    return parse_result_json(result_file)


def run_ours(root: str, model: str, epochs: int, runs: int, extra_args=None,
             cold_object: str = "item", backbone: str = "MF"):
    from coldrec_tpu.config import default_args
    import main as cli_main

    result_file = os.path.join(root, "tpu_result.txt")
    kwargs = dict(
        model=model, dataset="parity", cold_object=cold_object,
        backbone=backbone,
        data_dir=os.path.join(root, "data"),
        emb_dir=os.path.join(root, "emb"),
        epochs=epochs, runs=runs, result_file=result_file,
        result_overwrite=True,
    )
    if extra_args:
        kwargs.update(extra_args)
    args = default_args(**kwargs)
    print(f"[coldrec_tpu] model={model} epochs={epochs} runs={runs}")
    return cli_main.run(args)


def parse_result_json(path: str) -> dict:
    text = open(path).read()
    blob = text.split("--- JSON (machine-readable) ---")[-1]
    return json.loads(blob)


# t_{0.975, runs-1}: honest small-sample multiplier — a 5-sample std
# estimate itself wobbles (chi^2_4), so 2.0 sigma under-covers
_T975 = {
    2: 12.71, 3: 4.30, 4: 3.18, 5: 2.78, 6: 2.57, 7: 2.45, 8: 2.36,
    9: 2.31, 10: 2.26,
}


def _tmul(runs: int) -> float:
    """t_{0.975, runs-1}; past the table, the nearest CONSERVATIVE (wider)
    value: 2.23 (df=10) for runs 11-20, 2.09 (df=20) beyond — NEVER the
    runs=2 value as a fallback (a gap at runs=7 once made the tolerance
    5x too loose), and never a value tighter than the honest df."""
    if runs in _T975:
        return _T975[runs]
    if runs <= 20:
        return 2.23
    return 2.09


def _cold_noise_band(scale: str, cold_object: str, runs: int):
    """Bootstrapped null band for a mean of `runs` cold-metric draws
    (tools/cold_noise_analysis.py). None when no analysis exists."""
    if cold_object != "item":
        return None
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"COLD_NOISE_{scale}.json"
    )
    if not os.path.exists(path):
        return None
    null = json.load(open(path))["null"]
    # the analysis stores bands only for means of 2 and 5 draws; any other
    # run count gets NO noise-band rescue (borrowing a wider band would
    # over-rescue genuinely-below cells, a narrower one would mislabel)
    if runs not in (2, 5):
        return None
    return {
        cell: (st.get(f"corr_mean{runs}_p1"), st.get(f"corr_mean{runs}_p99"))
        for cell, st in null.items()
        if st.get(f"corr_mean{runs}_p1") is not None
    }


def compare(ref: dict, ours: dict, top_n="20", runs: int = 2,
            noise_band=None) -> dict:
    """Diff all four reference metrics (evaluator.py:17-115) per setting.

    Tolerance is the t-corrected standard error of the difference of the
    two run-means (t_{0.975}·SE + 0.005 floor), so adding runs tightens
    the check — the round-1 3·max(std)+0.02 rule let a 4x cold-metric gap
    pass (VERDICT round 1, "what's weak" #1).

    Cold-setting cells additionally consult the random-ranking null band
    (tools/cold_noise_analysis.py): under the synthetic generator cold
    items carry no learnable signal, the metric is a heavy-tailed lottery
    (a popular cold item landing in one run's global top-20 shifts a
    5-run mean by ~0.02), and a cell where BOTH sides sit inside the
    bootstrapped null band for the run-mean is verdicted
    "noise-dominated" — there is no parity signal to compare.
    """
    out = {
        "top_n": top_n, "runs": runs, "harness_version": 3,
        "metrics": {}, "pass": True,
    }
    tmul = _tmul(runs)
    for setting in ("all", "cold", "warm"):
        for metric in ("Hit", "Precision", "Recall", "NDCG"):
            r = ref["metrics"][top_n][setting][metric]
            o = ours["metrics"][top_n][setting][metric]
            se = ((r["std"] ** 2 + o["std"] ** 2) / max(runs, 1)) ** 0.5
            tol = tmul * se + 0.005
            diff = abs(r["mean"] - o["mean"])
            within = diff <= tol
            beats = o["mean"] > r["mean"] + tol
            cell = f"{setting}.{metric}@{top_n}"
            entry = {
                "reference": round(r["mean"], 5),
                "coldrec_tpu": round(o["mean"], 5),
                "diff": round(diff, 5),
                "tolerance": round(tol, 5),
            }
            if within:
                verdict = "parity"
            elif beats:
                verdict = "beats"
            else:
                verdict = "below"
            if (
                verdict == "below"
                and noise_band is not None
                and cell in noise_band
            ):
                lo, hi = noise_band[cell]
                if (
                    lo - 0.005 <= r["mean"] <= hi + 0.005
                    and lo - 0.005 <= o["mean"] <= hi + 0.005
                ):
                    verdict = "noise-dominated"
                    entry["null_band"] = [lo, hi]
            ok = verdict != "below"
            entry["verdict"] = verdict
            entry["pass"] = ok
            out["metrics"][cell] = entry
            out["pass"] &= ok
    import jax

    out["efficiency"] = {
        "reference_s_per_epoch": ref["efficiency"][
            "seconds_per_completed_epoch_mean"
        ],
        "coldrec_tpu_s_per_epoch": ours["efficiency"][
            "seconds_per_completed_epoch_mean"
        ],
        # r4 verdict weak #1: these timings are an accuracy-harness
        # side-product, not a controlled benchmark — label the environment
        # so they cannot be read as a head-to-head efficiency claim.
        "env": {
            "ours_platform": jax.default_backend(),
            "omp_num_threads": os.environ.get("OMP_NUM_THREADS", ""),
            "host_cpus": os.cpu_count(),
            "note": (
                "both sides ran sequentially on a shared host (parity "
                "lanes typically run in parallel with siblings); when "
                "ours_platform is 'cpu' this compares XLA-CPU against "
                "torch-CPU, NOT the framework's production TPU path. "
                "Controlled same-window A/B: tools/AB_EFFICIENCY.json / "
                "PERF.md 'Training efficiency head-to-head'."
            ),
        },
    }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="MF")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--scale", default="small", choices=list(SCALES))
    p.add_argument("--cold_object", default="item", choices=["item", "user"])
    p.add_argument("--backbone", default="MF")
    p.add_argument("--keep", action="store_true")
    p.add_argument(
        "--eval_every", type=int, default=1,
        help="evaluate every N epochs on BOTH sides (protocol-identical; "
        "cuts the per-epoch eval cost at the faithful-statistics tiers)",
    )
    p.add_argument(
        "--shared_backbone", action="store_true",
        help="convert the reference's trained backbone (.pt) into our npz "
        "bus so BOTH sides consume the same artifact — removes backbone-"
        "draw variance from cold-model comparisons (small datasets are "
        "dominated by it otherwise)",
    )
    args = p.parse_args()

    root = tempfile.mkdtemp(prefix="parity_")
    print(f"sandbox: {root}")
    build_dataset(root, args.scale, cold_object=args.cold_object)
    co, bb = args.cold_object, args.backbone
    ref_extra = ("--eval_every", str(args.eval_every))
    our_extra = {"eval_every": args.eval_every}
    if args.model not in ("MF", "LightGCN", "NGCF", "SimGCL", "XSimGCL",
                          "NCL", "KNN", "DUIF", "FSGNN", "CGRC"):
        # cold models load the backbone from each framework's own bus:
        # train it once per side in the same sandbox
        print(f"== pre-training {bb} backbone on both sides ==")
        run_reference(root, bb, args.epochs, 1, cold_object=co)
        if args.shared_backbone:
            import torch

            emb = os.path.join(root, "emb")
            tabs = {
                f"{side}_emb": torch.load(
                    os.path.join(
                        emb, f"parity_cold_{co}_{bb}_{side}_emb.pt"
                    ),
                    map_location="cpu",
                ).detach().numpy()
                for side in ("user", "item")
            }
            np.savez(os.path.join(emb, f"parity_cold_{co}_{bb}_emb.npz"), **tabs)
            print("== shared backbone: reference artifact fed to both sides ==")
        else:
            run_ours(root, bb, args.epochs, 1, cold_object=co)
    if args.model == "AMR":
        # AMR consumes VBPR's saved tensors (AMR.py:94-124)
        print("== pre-training VBPR on both sides ==")
        run_reference(root, "VBPR", args.epochs, 1, cold_object=co, backbone=bb)
        run_ours(root, "VBPR", args.epochs, 1, cold_object=co, backbone=bb)
    ref = run_reference(root, args.model, args.epochs, args.runs,
                        cold_object=co, backbone=bb, extra=ref_extra)
    ours = run_ours(root, args.model, args.epochs, args.runs,
                    cold_object=co, backbone=bb, extra_args=our_extra)
    verdict = compare(
        ref, ours, runs=args.runs,
        noise_band=_cold_noise_band(args.scale, args.cold_object, args.runs),
    )
    verdict["scale"] = args.scale
    verdict["epochs"] = args.epochs
    verdict["eval_every"] = args.eval_every
    verdict["shared_backbone"] = bool(args.shared_backbone)
    # the xing tier is a shape spot-check, not the artifact of record —
    # keep it in its own file so it never overwrites the ml/mlfull artifact
    suffix = "" if args.cold_object == "item" else "_user"
    if args.scale == "xing":
        suffix += "_xing"
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"PARITY_{args.model}{suffix}.json",
    )
    with open(out_path, "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps(verdict, indent=2))
    print("PARITY:", "PASS" if verdict["pass"] else "FAIL", "->", out_path)
    if not args.keep:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    return 0 if verdict["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
