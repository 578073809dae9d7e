"""Measure the UNMODIFIED reference's CCFCRec epoch time at the XING
statistics (VERDICT r3 task 2: either a parity artifact or "documented
reference-CPU-infeasibility with a measured epoch time").

Builds the xing-tier parity dataset (same generator/seed as the
harness), pre-trains the MF backbone 1 epoch, then runs CCFCRec for 1
epoch on the reference side only and reports wall time. A 5-run x
4-epoch parity head-to-head costs ~20x the measured epoch time on the
reference side alone — the go/no-go number for the artifact.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parity_check import build_dataset, run_reference


def main():
    root = "/root/repo/tools/ccfcrec_xing_workdir"
    os.makedirs(root, exist_ok=True)
    marker = os.path.join(root, "data", "parity", "parity.csv")
    if not os.path.exists(marker):
        print("building xing dataset...", flush=True)
        t0 = time.time()
        build_dataset(root, "xing")
        print(f"dataset built in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    print("reference MF backbone (1 epoch)...", flush=True)
    run_reference(root, "MF", epochs=1, runs=1)
    t_mf = time.time() - t0
    print(f"reference MF 1-epoch wall: {t_mf:.0f}s", flush=True)
    t0 = time.time()
    print("reference CCFCRec (1 epoch)...", flush=True)
    ref = run_reference(root, "CCFCRec", epochs=1, runs=1)
    t_cc = time.time() - t0
    out = {
        "shape": "xing (106881 x 20519, 3.86M nnz, content 2738)",
        "reference_mf_1epoch_wall_s": round(t_mf, 1),
        "reference_ccfcrec_1epoch_wall_s": round(t_cc, 1),
        "reference_ccfcrec_s_per_epoch_reported": ref.get(
            "efficiency", {}
        ).get("seconds_per_completed_epoch_mean"),
        "parity_cost_estimate_s": round(t_cc * 20, 1),
        "note": "parity artifact = 5 runs x 4 epochs on the reference "
        "side alone (plus eval); 20x the 1-epoch wall is the floor",
    }
    with open("/root/repo/tools/CCFCREC_XING_COST.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
