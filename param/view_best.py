"""Inspect tuned params saved by param_search.py (reference: param/view_best.py)."""
import argparse
import pickle

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--cold_object", default="item")
    p.add_argument("--backbone", default="MF")
    a = p.parse_args()
    path = f"./param/{a.model}_{a.dataset}_{a.cold_object}_bb_{a.backbone}_cs.pkl"
    with open(path, "rb") as f:
        best = pickle.load(f)
    print(f"Best params from {path}:")
    # the pkl is the BARE params dict (reference contract); older runs of
    # this framework wrapped it as {"best_params": ..., "best_value": ...}
    for k, v in best.get("best_params", best).items() if isinstance(best, dict) else []:
        print(f"  {k}: {v}")
    if isinstance(best, dict) and "best_value" in best:
        print(f"  (objective value: {best['best_value']})")
    else:
        import json
        import os

        sidecar = path[:-4] + ".value.json"
        if os.path.exists(sidecar):
            v = json.load(open(sidecar))["best_value"]
            print(f"  (objective value: {v})")
