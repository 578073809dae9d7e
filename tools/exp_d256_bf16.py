"""d=256 escape-hatch check (round-4 VERDICT weak #4 / task 7).

PERF.md parks the retrieval kernel's 23% MFU on "bf16 is a measured dead
end at d=64 (DMA/VPU-bound); revisit at d >= 256 where arithmetic
intensity quadruples" — but that escape hatch was never demonstrated.
This runs ONE synthetic d=256 book-crossing-width config through the
production fused kernel, fp32 vs bf16 operands, with the repo's
two-point chained-dependency timing, plus the raw bf16/fp32 matmul
ceiling at the same shape for context (tools/ubench_d256.log measured the
raw matmuls only).

Outcome either validates the parking rationale (bf16 wins at d=256) or
refutes it, in which case PERF.md's rationale paragraph must be
corrected. Writes tools/D256_BF16.json.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def device_sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def main():
    import jax
    import jax.numpy as jnp

    from coldrec_tpu.ops.pallas.retrieval import (
        _round_up, _sweep_padded, default_block_i,
    )

    B, I, D, K, R = 1024, 270336, 256, 20, 64
    rng = np.random.default_rng(7)
    ue = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    ie = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
    rated = np.full((B, R), I, np.int32)
    for u in range(B):
        rated[u, : R // 2] = rng.choice(I, R // 2, replace=False)
    rat = jnp.asarray(rated)
    exc = jnp.asarray(np.zeros(I, bool))
    block_i = default_block_i(I, D)
    i_pad, b_pad = _round_up(I, block_i), _round_up(B, 256)

    # tables are ARGUMENTS, not closure constants: a 277 MB (270k, 256)
    # constant embedded in the program blows the remote-compile tunnel's
    # request-size limit (HTTP 413)
    @functools.partial(jax.jit, static_argnames=("length", "bf16"))
    def chained(u, ie, rat, exc, length, bf16):
        def body(u, _):
            vals, _, sus = _sweep_padded(
                u, ie, rat, exc, i_pad, b_pad, 256, block_i, K, bf16=bf16
            )
            dep = vals[:, :1] + sus[:, None].astype(u.dtype)
            return u + 1e-38 * dep, None

        u, _ = jax.lax.scan(body, u, None, length=length)
        return u

    def timed(length, bf16):
        u = device_sync(chained(ue, ie, rat, exc, length, bf16))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            u = device_sync(chained(u, ie, rat, exc, length, bf16))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    res = {}
    for bf16 in (False, True):
        t = (timed(16, bf16) - timed(8, bf16)) / 8
        name = "pallas_bf16" if bf16 else "pallas_fp32"
        res[name + "_ms"] = round(t * 1e3, 3)
        res[name + "_gpairs_per_s"] = round(B * I / t / 1e9, 1)
        print(f"{name}: {t * 1e3:.3f} ms  "
              f"{B * I / t / 1e9:.1f} G pairs/s", flush=True)

    # raw matmul ceiling at the same shape (context)
    @functools.partial(jax.jit, static_argnames=("length", "dtype"))
    def mm_chain(u, ie, length, dtype):
        tbl = ie.astype(dtype)

        def body(u, _):
            s = u.astype(dtype) @ tbl.T
            m = jnp.max(s.astype(jnp.float32), axis=1)
            return u + 1e-38 * m[:, None], None

        u, _ = jax.lax.scan(body, u, None, length=length)
        return u

    def mm_timed(length, dtype):
        u = device_sync(mm_chain(ue, ie, length, dtype))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            u = device_sync(mm_chain(u, ie, length, dtype))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    for dt, name in ((jnp.float32, "matmul_fp32"), (jnp.bfloat16,
                                                    "matmul_bf16")):
        t = (mm_timed(16, dt) - mm_timed(8, dt)) / 8
        res[name + "_ms"] = round(t * 1e3, 3)
        res[name + "_gpairs_per_s"] = round(B * I / t / 1e9, 1)
        print(f"{name}: {t * 1e3:.3f} ms", flush=True)

    res["bf16_kernel_speedup"] = round(
        res["pallas_fp32_ms"] / res["pallas_bf16_ms"], 3)
    res["bf16_matmul_speedup"] = round(
        res["matmul_fp32_ms"] / res["matmul_bf16_ms"], 3)
    res["config"] = {"B": B, "I": I, "d": D, "k": K, "rated": R,
                     "block_i": int(block_i)}
    res["device"] = jax.devices()[0].device_kind
    path = os.path.join(REPO, "tools", "D256_BF16.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
