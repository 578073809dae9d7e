"""jit-compiled k-means (Lloyd iterations) on device.

Replaces faiss.Kmeans (NCL.py:38-55) and sklearn KMeans (GoRec.py:134).
Each Lloyd iteration is an MXU matmul (pairwise scores) + argmin + segment
mean — fully static shapes. Empty clusters keep their previous centroid.
Parity note: faiss/sklearn initialization differs (seed-sensitive);
statistical parity of the clustering objective is the contract (SURVEY §7
hard part f).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "n_iters"))
def kmeans(
    key: jax.Array, x: jnp.ndarray, k: int, n_iters: int = 20
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (centroids (k, d), assignment (n,)) for x (n, d)."""
    n = x.shape[0]
    idx = jax.random.choice(key, n, shape=(k,), replace=False)
    init_centroids = x[idx]

    def assign(centroids):
        # argmin ||x - c||^2 == argmax (x.c - ||c||^2/2); one matmul
        logits = x @ centroids.T - 0.5 * jnp.sum(
            centroids * centroids, axis=1
        )
        return jnp.argmax(logits, axis=1)

    def step(centroids, _):
        a = assign(centroids)
        sums = jax.ops.segment_sum(x, a, num_segments=k)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), x.dtype), a, num_segments=k
        )
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centroids
        )
        return new, None

    centroids, _ = jax.lax.scan(step, init_centroids, None, length=n_iters)
    return centroids, assign(centroids)
