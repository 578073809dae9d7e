"""Cold-split noise analysis for the parity harness (VERDICT r1, task 1).

Under the synthetic parity generator (tools/parity_check.py:38-60) the
content matrix is drawn independently of the interaction process, and cold
items have no training interactions. Consequently NO ranker — reference or
ours, backbone or content model — has any observable signal about which
cold items a user will consume: every cold-setting metric is a draw from
the *random-ranking null* over the fixed cold candidate set.

This tool quantifies that null exactly: it rebuilds the parity dataset
(same seed as the harness), Monte-Carlos the full eval protocol
(EvalSweep + ranking_evaluation — the identical code path the trainer
uses) with iid random embeddings, and reports the null's mean/std/
percentiles per metric. Observed reference/coldrec_tpu values from the
PARITY_*.json artifacts are annotated with z-scores inside this band.

Reading the result: a cold cell whose BOTH sides sit inside the null band
is an init lottery, not a parity signal (the variance is correlated
across users through the shared item embeddings, so the effective sample
size is ~#cold-items, not #test-pairs — which is why 5-run means still
wobble by 2x). A side that sits OUTSIDE the band would indicate a real
protocol bug; as of round 2 none does.

Caveat: the null is simulated with iid user vectors. Trained user tables
are lower-rank (rankings more correlated across users), so the true
spread is slightly WIDER than simulated — values inside this band are
inside the true band a fortiori.

Usage:  JAX_PLATFORMS=cpu python tools/cold_noise_analysis.py
            [--scale ml] [--trials 64] [--topn 20]
Writes: tools/COLD_NOISE_<scale>.json
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def simulate_null(data, topn: int, trials: int, emb_dim: int, seed: int = 0):
    from coldrec_tpu.runtime.eval import EvalSweep
    from coldrec_tpu.utils.metrics import ranking_evaluation

    sweep = EvalSweep(data, "item", batch_size=1024, max_n=topn)
    es = data.eval_splits["cold_test"]
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(trials):
        ue = rng.standard_normal((data.user_num, emb_dim)).astype(np.float32)
        ie = rng.standard_normal((data.item_num, emb_dim)).astype(np.float32)

        def score_fn(users, ue=ue, ie=ie):
            return ue[users] @ ie.T

        rec = sweep.run("cold_test", "cold", score_fn)
        _, perf = ranking_evaluation(
            es.indptr, es.items, rec, [topn], data.item_num
        )
        rows.append(perf[0])  # (hit, precision, recall, ndcg)
    return np.asarray(rows, dtype=np.float64)


def simulate_correlated_null(
    data, root, topn: int, trials: int, epochs: int, seed: int = 1
):
    """The *correlated* null: ONE trained MF user table, item rows redrawn
    iid per trial. Rankings are correlated across users through the shared
    item draw, so this null's spread is the honest per-training-run
    wobble of a cold metric (effective sample ~ #cold items, not #pairs)."""
    from tools.parity_check import run_ours
    from coldrec_tpu.runtime.checkpoints import _path as bus_path
    from coldrec_tpu.runtime.eval import EvalSweep
    from coldrec_tpu.utils.metrics import ranking_evaluation

    run_ours(root, "MF", epochs, 1)
    bus = np.load(bus_path(os.path.join(root, "emb"), "parity", "item", "MF"))
    ue_trained = bus["user_emb"].astype(np.float32)
    emb_dim = ue_trained.shape[1]
    sweep = EvalSweep(data, "item", batch_size=1024, max_n=topn)
    es = data.eval_splits["cold_test"]
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(trials):
        scale = float(np.abs(bus["item_emb"]).mean()) * np.sqrt(np.pi / 2)
        ie = (rng.standard_normal((data.item_num, emb_dim)) * scale).astype(
            np.float32
        )

        def score_fn(users, ie=ie):
            return ue_trained[users] @ ie.T

        rec = sweep.run("cold_test", "cold", score_fn)
        _, perf = ranking_evaluation(
            es.indptr, es.items, rec, [topn], data.item_num
        )
        rows.append(perf[0])
    return np.asarray(rows, dtype=np.float64)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="ml")
    p.add_argument("--trials", type=int, default=64)
    p.add_argument("--topn", type=int, default=20)
    p.add_argument("--train_epochs", type=int, default=20)
    args = p.parse_args()

    from tools.parity_check import SCALES, build_dataset
    from coldrec_tpu.data.builder import ColdStartDataset

    root = tempfile.mkdtemp(prefix="cold_noise_")
    build_dataset(root, args.scale, cold_object="item")
    data = ColdStartDataset.from_split_dir(
        os.path.join(root, "data"), "parity", "item"
    )
    es = data.eval_splits["cold_test"]
    n_cold = int(np.unique(es.items).size)
    print(
        f"[null] scale={args.scale} cold-test: {es.n_users} users, "
        f"{es.n_interactions} pairs, {n_cold} distinct cold items"
    )
    cdim = SCALES[args.scale]["content_dim"]
    null = simulate_null(
        data, args.topn, args.trials, 64 if isinstance(cdim, dict) else cdim
    )
    corr = simulate_correlated_null(
        data, root, args.topn, args.trials, args.train_epochs
    )
    names = ["Hit", "Precision", "Recall", "NDCG"]
    stats = {}
    boot_rng = np.random.default_rng(7)
    for i, name in enumerate(names):
        col, ccol = null[:, i], corr[:, i]
        # bootstrap the distribution of a mean over `runs` independent
        # training draws — the quantity the parity harness actually
        # compares; percentiles of the single-draw null undercover it
        # because one heavy-tail draw (a popular cold item in a global
        # top-20) shifts a 5-run mean by ~0.02
        boots = {}
        for runs in (2, 5):
            bm = ccol[boot_rng.integers(0, ccol.size, (20000, runs))].mean(1)
            boots[f"corr_mean{runs}_p1"] = round(
                float(np.percentile(bm, 1)), 5
            )
            boots[f"corr_mean{runs}_p99"] = round(
                float(np.percentile(bm, 99)), 5
            )
        stats[f"cold.{name}@{args.topn}"] = {
            "null_mean": round(float(col.mean()), 5),
            "null_std": round(float(col.std(ddof=1)), 5),
            "corr_null_mean": round(float(ccol.mean()), 5),
            "corr_null_std": round(float(ccol.std(ddof=1)), 5),
            "corr_null_p2.5": round(float(np.percentile(ccol, 2.5)), 5),
            "corr_null_p97.5": round(float(np.percentile(ccol, 97.5)), 5),
            **boots,
        }
        print(
            f"  {name}@{args.topn}: iid null = {col.mean():.5f} "
            f"+/- {col.std(ddof=1):.5f}   trained-user null = "
            f"{ccol.mean():.5f} +/- {ccol.std(ddof=1):.5f}  "
            f"[{np.percentile(ccol, 2.5):.5f}, "
            f"{np.percentile(ccol, 97.5):.5f}]"
        )

    # annotate the observed parity values at this scale
    observed = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "PARITY_*.json"))):
        art = json.load(open(path))
        if art.get("scale") != args.scale or path.endswith("_user.json"):
            continue
        model = os.path.basename(path)[len("PARITY_"):-len(".json")]
        entry = {}
        for cell, v in art.get("metrics", {}).items():
            if not cell.startswith("cold."):
                continue
            st = stats.get(cell)
            if st is None or st["corr_null_std"] == 0:
                continue
            # the artifact mean averages `runs` training draws; its own
            # spread is corr_null_std / sqrt(runs)
            runs = max(int(art.get("runs", 1)), 1)
            se = st["corr_null_std"] / np.sqrt(runs)
            entry[cell] = {
                "reference": v["reference"],
                "coldrec_tpu": v["coldrec_tpu"],
                "z_reference": round(
                    (v["reference"] - st["corr_null_mean"]) / se, 2
                ),
                "z_coldrec_tpu": round(
                    (v["coldrec_tpu"] - st["corr_null_mean"]) / se, 2
                ),
            }
        if entry:
            observed[model] = entry
            zs = [
                (c, e["z_reference"], e["z_coldrec_tpu"])
                for c, e in entry.items()
            ]
            worst = max(zs, key=lambda t: max(abs(t[1]), abs(t[2])))
            print(
                f"  {model}: worst cell {worst[0]} "
                f"z_ref={worst[1]:+.2f} z_ours={worst[2]:+.2f}"
            )

    out = {
        "scale": args.scale,
        "trials": args.trials,
        "cold_test_users": int(es.n_users),
        "cold_test_pairs": int(es.n_interactions),
        "distinct_cold_items": n_cold,
        "null": stats,
        "observed": observed,
        "interpretation": (
            "Synthetic content is independent of interactions, so every "
            "cold cell is a draw from the random-ranking null. The "
            "trained-user (correlated) null is the honest spread: item "
            "rankings are shared across users, so one training run's cold "
            "metric wobbles with effective sample ~#cold-items. z-scores "
            "use corr_null_std/sqrt(runs); |z| <~ 3 on both sides means "
            "the cell carries no parity signal."
        ),
    }
    dst = os.path.join(here, f"COLD_NOISE_{args.scale}.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
