"""Synthetic dataset generation for tests and benchmarks.

Generates an implicit-feedback interaction log with a skewed (zipf-like)
item popularity distribution, runs it through the real split protocol
(:mod:`coldrec_tpu.data.split`), and builds a :class:`ColdStartDataset` —
so every test exercises the production protocol path end to end.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .builder import ColdStartDataset
from .split import SplitResult, cold_start_split


def synthetic_interactions(
    n_users: int,
    n_items: int,
    n_inter: int,
    seed: int = 0,
    zipf_a: float = 1.1,
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    users = rng.integers(0, n_users, size=n_inter)
    # zipf-ish popularity over items
    ranks = rng.zipf(zipf_a, size=n_inter) % n_items
    pairs = np.stack([users, ranks], axis=1).astype(np.int64)
    # guarantee every user and item appears at least once
    extra_u = np.stack(
        [np.arange(n_users), rng.integers(0, n_items, n_users)], axis=1
    )
    extra_i = np.stack(
        [rng.integers(0, n_users, n_items), np.arange(n_items)], axis=1
    )
    return np.concatenate([pairs, extra_u, extra_i]).astype(np.int64)


def synthetic_dataset(
    n_users: int = 200,
    n_items: int = 120,
    n_inter: int = 4000,
    content_dim: int = 16,
    cold_object: str = "item",
    seed: int = 0,
) -> Tuple[ColdStartDataset, SplitResult]:
    pairs = synthetic_interactions(n_users, n_items, n_inter, seed=seed)
    res = cold_start_split(pairs, cold_object=cold_object, seed=seed + 42)
    rng = np.random.default_rng(seed + 1)
    user_content: Optional[np.ndarray] = None
    item_content: Optional[np.ndarray] = None
    if cold_object == "user":
        user_content = rng.standard_normal((res.user_num, content_dim)).astype(
            np.float32
        )
    else:
        item_content = rng.standard_normal((res.item_num, content_dim)).astype(
            np.float32
        )
    data = ColdStartDataset(
        training=res.warm_train,
        warm_val=res.warm_val,
        cold_val=res.cold_val,
        overall_val=res.overall_val,
        warm_test=res.warm_test,
        cold_test=res.cold_test,
        overall_test=res.overall_test,
        user_num=res.user_num,
        item_num=res.item_num,
        warm_user=res.warm_user,
        warm_item=res.warm_item,
        cold_user=res.cold_user,
        cold_item=res.cold_item,
        user_content=user_content,
        item_content=item_content,
    )
    return data, res
