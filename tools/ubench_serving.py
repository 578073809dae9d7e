"""Serving-path latency microbenchmark (runtime/serving.RetrievalServer).

Measures per-request latency of masked top-k retrieval at book-crossing
scale (270,336 items, d=64, k=20) for online-serving batch sizes, through
the same dependency-chained methodology as tools/ubench_retrieval.py
(jitted lax.scan over N chained sweeps — no dispatch pipelining) plus the
end-to-end single-request path (host→device→kernel→host, incl. this
environment's remote-dispatch tunnel).

Usage: python tools/ubench_serving.py [--items 270336] [--iters 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=270_336)
    ap.add_argument("--users", type=int, default=92_107)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    from coldrec_tpu.runtime.serving import RetrievalServer

    rng = np.random.default_rng(0)
    ue = rng.standard_normal((args.users, args.d)).astype(np.float32)
    ie = rng.standard_normal((args.items, args.d)).astype(np.float32)
    srv = RetrievalServer(ue, ie)
    print(f"platform={jax.devices()[0].platform} items={args.items} "
          f"d={args.d} k={args.k}")

    for bs in (1, 16, 256, 1024, 4096):
        uids = rng.integers(0, args.users, bs).astype(np.int32)
        srv.topk(uids, args.k)  # compile + warm
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            srv.topk(uids, args.k)
            lat.append(time.perf_counter() - t0)
        lat = np.sort(np.array(lat))
        p50 = lat[len(lat) // 2] * 1e3
        p95 = lat[int(len(lat) * 0.95)] * 1e3
        pairs = bs * args.items / (lat[len(lat) // 2])
        print(
            f"bs={bs:5d}  p50={p50:8.2f} ms  p95={p95:8.2f} ms  "
            f"{pairs/1e9:8.2f} G pairs/s e2e"
        )


if __name__ == "__main__":
    main()
