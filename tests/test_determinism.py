"""Determinism: identical seeds -> identical trajectories (SURVEY §4/§5.2).

JAX is deterministic by construction via explicit PRNG keys; the host
sampler streams are seeded numpy/native generators. Two identically-seeded
runs must produce bitwise-identical metrics; a different seed must not.
"""
import numpy as np

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


def _run(data, seed):
    args = default_args(
        model="MF", dataset="synth", epochs=3, bs=256, emb_size=16,
        early_stop=10, seed=seed, save_emb=False,
    )
    model = model_factory(Config(args, data))
    model.run()
    return (
        model.overall_test_results,
        model.cold_test_results,
        model.warm_test_results,
    )


def test_same_seed_same_metrics():
    data, _ = synthetic_dataset(
        n_users=80, n_items=90, n_inter=1600, cold_object="item", seed=61
    )
    a = _run(data, seed=3)
    b = _run(data, seed=3)
    assert a == b  # exact equality, incl. every rounded metric

    c = _run(data, seed=4)
    assert a != c  # a different seed must actually change the run


def test_split_deterministic():
    from coldrec_tpu.data.split import cold_start_split
    from coldrec_tpu.data.synthetic import synthetic_interactions

    pairs = synthetic_interactions(100, 80, 1500, seed=5)
    r1 = cold_start_split(pairs, seed=9)
    r2 = cold_start_split(pairs, seed=9)
    np.testing.assert_array_equal(r1.warm_train, r2.warm_train)
    np.testing.assert_array_equal(r1.cold_val, r2.cold_val)
    r3 = cold_start_split(pairs, seed=10)
    assert not np.array_equal(r1.warm_train, r3.warm_train)
