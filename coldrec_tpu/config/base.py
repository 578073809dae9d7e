"""Common configuration flags (reference: main.py:90-143 argparse defaults).

The args object is a plain namespace so the CLI (argparse), the Optuna
search, and test code all share one shape. ``default_args`` reproduces the
reference's common defaults; model-specific flags are layered on by
:mod:`coldrec_tpu.config.model_params`.
"""
from __future__ import annotations

import argparse
from types import SimpleNamespace

COMMON_DEFAULTS = dict(
    dataset="citeulike",
    model="MF",
    epochs=500,
    layers=2,
    topN="10,20",
    bs=4096,
    emb_size=64,
    lr=0.001,
    reg=0.0001,
    runs=1,
    seed=2024,
    save_emb=True,
    # bus artifact format: npz (native) | pt (the reference's torch.save
    # per-tensor layout, for interchange) | both
    save_emb_format="npz",
    cold_object="item",
    backbone="MF",
    early_stop=10,
    eval_every=1,
    data_dir="./data",
    emb_dir="./emb",
    result_dir="./result",
    result_log="history.txt",
    result_file="",
    result_overwrite=False,
    # mid-training checkpoint/resume (framework addition; empty = off)
    state_ckpt="",
    # device mesh "DxM" (data x model axes), e.g. "8x1" pure DP or "2x4"
    # DP+TP with row-sharded tables; empty = single-device (framework
    # addition; the reference is strictly single-device)
    mesh="",
    # retrieval sweep backend: "auto" routes factored-embedding models
    # through the fused Pallas kernel (ops/pallas/retrieval.py) on TPU at
    # every item width (8-16x the XLA path from I=512 up, 50-95x at
    # book-crossing scale — tools/ubench_retrieval.py); "xla" / "pallas"
    # force a path; "pallas_bf16" = opt-in serving mode with bf16 score
    # tiles (f32 accumulate; exact top-k of the bf16-rounded scores).
    eval_backend="auto",
    # write a jax.profiler trace (viewable in TensorBoard/Perfetto) for the
    # whole run to this directory; empty = off (framework addition,
    # SURVEY §5.1 — the reference has wall-clock timing only)
    profile="",
    # jax.config.jax_debug_nans: fail fast at the op that produced a NaN
    # (framework addition, SURVEY §5.2)
    debug_nans=False,
    # fuse K consecutive train steps into ONE device program (lax.scan
    # over host-stacked batches) in the warm-backbone loop — amortizes
    # per-step dispatch + batch-transfer round trips, which dominate
    # small-step models in remote-dispatch environments (measured: MF at
    # XING shape; tools/exp_fused_steps.py proves loss- and param-exact
    # equivalence). 0 = off (per-batch dispatch, the reference-shaped
    # loop). Framework addition; semantics are identical either way.
    fused_steps=0,
)


def default_args(**overrides) -> SimpleNamespace:
    d = dict(COMMON_DEFAULTS)
    model = overrides.get("model", d["model"])
    from .model_params import registry_defaults

    d.update(registry_defaults(model))
    d.update(overrides)
    return SimpleNamespace(**d)


def make_args(argv=None) -> argparse.Namespace:
    """Two-stage argparse mirroring the reference CLI (main.py:83-146)."""
    from .model_params import add_model_params

    parser = argparse.ArgumentParser(description="coldrec_tpu")
    for name, val in COMMON_DEFAULTS.items():
        if isinstance(val, bool):
            parser.add_argument(f"--{name}", type=_str2bool, default=val)
        else:
            parser.add_argument(f"--{name}", type=type(val), default=val)
    args, _ = parser.parse_known_args(argv)
    parser = add_model_params(args.model, parser)
    return parser.parse_args(argv)


def _str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")
