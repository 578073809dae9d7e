import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp, optax
from coldrec_tpu.models.common import adam, xavier_uniform
from coldrec_tpu.ops.losses import bpr_loss, l2_reg_loss
n_iter, bs = 64, 4096
n_users, n_items, reg = 92107, 270170, 1e-4
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
params = {"user_emb": xavier_uniform(k1, (n_users, 64)),
          "item_emb": xavier_uniform(k2, (n_items, 64))}
optimizer = adam(1e-3)
opt_state = optimizer.init(params)
rng = np.random.default_rng(3)
batches = {
    "user": jnp.asarray(rng.integers(0, n_users, (n_iter, bs), dtype=np.int32)),
    "pos_item": jnp.asarray(rng.integers(0, n_items, (n_iter, bs), dtype=np.int32)),
    "neg_item": jnp.asarray(rng.integers(0, n_items, (n_iter, bs), dtype=np.int32)),
    "weight": jnp.ones((n_iter, bs), jnp.float32),
}
def loss_fn(params, batch):
    u = params["user_emb"][batch["user"]]
    pos = params["item_emb"][batch["pos_item"]]
    neg = params["item_emb"][batch["neg_item"]]
    w = batch["weight"]
    return bpr_loss(u, pos, neg, w) + l2_reg_loss(reg, u, pos, neg, weight=w)
@jax.jit
def fused(params, opt_state, bs_):
    def body(carry, b):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, o = optimizer.update(grads, o, p)
        return (optax.apply_updates(p, updates), o), loss
    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), bs_)
    return params, opt_state, losses
for n in (64, 32, 64, 32):
    xs = {k: v[:n] for k, v in batches.items()}
    p, o = params, opt_state
    p, o, _ = fused(p, o, xs)
    jax.block_until_ready(p)  # compile+warm; p now differs from params
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        p, o, _ = fused(p, o, xs)  # fresh args every rep: no memoization
        jax.block_until_ready(p)
        ts.append(time.perf_counter() - t0)
    print(f"chain {n}: reps = {[f'{t*1e3:.1f}' for t in sorted(ts)]} ms", flush=True)
