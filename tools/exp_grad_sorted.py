"""grad-only A/B: plain-indexing backward vs sorted-scatter lookup."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from coldrec_tpu.models.common import xavier_uniform
from exp_mf_step_decomp import lookup  # self-contained sorted-scatter gather
from coldrec_tpu.ops.losses import bpr_loss, l2_reg_loss

N_USERS, N_ITEMS, DIM, BS, REG, N_ITER = 92_107, 270_170, 64, 4096, 1e-4, 32
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = {"user_emb": xavier_uniform(k1, (N_USERS, DIM)),
          "item_emb": xavier_uniform(k2, (N_ITEMS, DIM))}
rng = np.random.default_rng(3)
batches = {
    "user": jnp.asarray(rng.integers(0, N_USERS, (N_ITER, BS), dtype=np.int32)),
    "pos_item": jnp.asarray(rng.integers(0, N_ITEMS, (N_ITER, BS), dtype=np.int32)),
    "neg_item": jnp.asarray(rng.integers(0, N_ITEMS, (N_ITER, BS), dtype=np.int32)),
    "weight": jnp.ones((N_ITER, BS), jnp.float32),
}

def mkloss(lk):
    def loss_fn(p, b):
        u = lk(p["user_emb"], b["user"])
        pos = lk(p["item_emb"], b["pos_item"])
        neg = lk(p["item_emb"], b["neg_item"])
        w = b["weight"]
        return bpr_loss(u, pos, neg, w) + l2_reg_loss(REG, u, pos, neg, weight=w)
    return loss_fn

def chain(loss_fn):
    def timed(n):
        @jax.jit
        def run(p):
            def body(p, b):
                _, g = jax.value_and_grad(loss_fn)(p, b)
                return jax.tree.map(lambda x, gg: x + 1e-38 * gg, p, g), None
            xs = jax.tree.map(lambda a: a[:n], batches)
            p, _ = jax.lax.scan(body, p, xs, length=n)
            return p
        jax.block_until_ready(run(params))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(run(params))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(N_ITER) - timed(N_ITER // 2)) / (N_ITER // 2)

for name, lk in (("plain", lambda t, i: t[i]), ("sorted", lookup),
                 ("plain2", lambda t, i: t[i]), ("sorted2", lookup)):
    t = chain(mkloss(lk))
    print(f"grad {name}: {t*1e3:7.3f} ms", flush=True)
