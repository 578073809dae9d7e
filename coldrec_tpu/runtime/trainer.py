"""Trainer runtime: the contract every model obeys.

Rebuild of ``BaseColdStartTrainer`` (ColdRec model/BaseRecommender.py:13-370)
on the functional JAX substrate:

  * abstract ``train`` / ``batch_scores`` / ``save`` (BaseRecommender.py:63-107);
  * ``run()`` orchestration: train then test under all/cold/warm settings
    (353-370);
  * masked top-k evaluation via :class:`coldrec_tpu.runtime.eval.EvalSweep`
    (153-188);
  * ``fast_evaluation``: validation-driven early stopping on strict
    improvement of NDCG@max(topN); non-finite metrics never become "best"
    and consume patience (268-351);
  * per-split result recording (230-254).

Host python drives epochs; each step is one jitted XLA program. Scores for
evaluation come from ``batch_scores(user_ids)`` — the analog of the
reference's ``batch_predict`` but operating on mapped ids and returning a
device array, so masking + top-k stay on device.
"""
from __future__ import annotations

import math
import time
from abc import ABC, abstractmethod
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.builder import ColdStartDataset
from ..utils.metrics import ranking_evaluation
from .eval import EvalSweep


class Config:
    """Bundles parsed args + built dataset (reference: main.py Config)."""

    def __init__(self, args, data: Optional[ColdStartDataset] = None):
        self.args = args
        if data is None:
            data = ColdStartDataset.from_split_dir(
                args.data_dir, args.dataset, args.cold_object
            )
        self.data = data


_SETTING_SPLITS = {
    ("all", "valid"): "overall_val",
    ("cold", "valid"): "cold_val",
    ("warm", "valid"): "warm_val",
    ("all", "test"): "overall_test",
    ("cold", "test"): "cold_test",
    ("warm", "test"): "warm_test",
}

_METRIC_NAMES = ["Hit Ratio", "Precision", "Recall", "NDCG"]


class BaseColdStartTrainer(ABC):
    def __init__(self, config: Config):
        self.config = config
        self.args = config.args
        self.data: ColdStartDataset = config.data
        self.best_performance: list = []
        self.topN = [int(x) for x in str(self.args.topN).split(",")]
        self.max_N = max(self.topN)
        self.model_name = self.args.model
        self.dataset_name = self.args.dataset
        self.emb_size = int(self.args.emb_size)
        self.max_epoch = int(self.args.epochs)
        self.batch_size = int(self.args.bs)
        self.lr = float(self.args.lr)
        self.reg = float(self.args.reg)
        self.result: List[str] = []
        self.early_stop_flag = int(self.args.early_stop) != 0
        if self.early_stop_flag:
            self.early_stop_patience = int(self.args.early_stop)
            self.max_early_stop_patience = int(self.args.early_stop)
        self.epochs_ran = 0
        self.eval_every = max(1, int(getattr(self.args, "eval_every", 1)))
        self.sweep = EvalSweep(
            self.data, self.args.cold_object, self.batch_size, self.max_N
        )
        self.overall_test_results = None
        self.cold_test_results = None
        self.warm_test_results = None
        self.train_start_time = 0.0
        self.train_end_time = 0.0
        # host RNG for samplers; device keys are derived by models
        seed = int(getattr(self.args, "seed", 2024))
        self.host_rng = np.random.default_rng(seed)
        self.rng_key = jax.random.PRNGKey(seed)
        from ..utils.logging import event_log

        self.events = event_log()
        self.events.emit(
            "run_start",
            model=self.model_name,
            dataset=self.dataset_name,
            cold_object=self.args.cold_object,
            emb_size=self.emb_size,
            seed=seed,
        )

    # ------------------------------------------------------------- contract
    @abstractmethod
    def train(self) -> None:
        ...

    @abstractmethod
    def batch_scores(self, user_ids: np.ndarray) -> jnp.ndarray:
        """(len(user_ids), item_num) scores for mapped user ids."""
        ...

    @abstractmethod
    def save(self) -> None:
        """Snapshot the current (best) eval-ready state in RAM."""
        ...

    def predict(self, raw_user) -> np.ndarray:
        """Scores over all items for one raw user id (reference predict())."""
        uid = self.data.map_users(np.array([raw_user]))
        return np.asarray(jax.device_get(self.batch_scores(uid.astype(np.int32))))[0]

    def batch_predict(self, raw_users) -> np.ndarray:
        """(len(raw_users), item_num) scores for a list of raw user ids
        (reference batch_predict(), MF.py:58-63)."""
        uid = self.data.map_users(np.asarray(raw_users))
        return np.asarray(
            jax.device_get(self.batch_scores(uid.astype(np.int32)))
        )

    # ------------------------------------------------------------- plumbing
    def next_key(self) -> jax.Array:
        self.rng_key, sub = jax.random.split(self.rng_key)
        return sub

    def timer(self, start: bool = True):
        if start:
            self.train_start_time = time.time()
        else:
            self.train_end_time = time.time()

    def print_basic_info(self):
        print("*" * 80)
        print("Model: ", self.model_name)
        print("Dataset: ", self.dataset_name)
        print("Embedding Dimension:", self.emb_size)
        print("Maximum Epoch:", self.max_epoch)
        print("Learning Rate:", self.lr)
        print("Batch Size:", self.batch_size)
        print("*" * 80)

    # ----------------------------------------------------------------- eval
    def _rec_lists(self, phase: str, data_type: str) -> np.ndarray:
        split = _SETTING_SPLITS[(data_type, phase)]
        backend = str(getattr(self.args, "eval_backend", "auto"))
        factored = (
            getattr(self, "user_emb", None) is not None
            and getattr(self, "item_emb", None) is not None
        )
        on_tpu = jax.devices()[0].platform == "tpu"
        # auto: the fused Pallas sweep is the production TPU path at EVERY
        # width — XLA's masked_topk carries a ~13 ms fixed top-k cost per
        # 2048-user chunk that dwarfs the scoring matmul (8-16x slower from
        # I=512 up; 50-95x at 270k items — tools/ubench_retrieval.py).
        # Round 1's "XLA near-peak" reading was a measurement artifact of
        # the remote backend memoizing repeated identical dispatches; see
        # PERF.md "Honest retrieval timings". XLA serves non-factored
        # models (network scoring) and CPU runs.
        # pallas_bf16: opt-in serving mode — bf16 score tiles (f32
        # accumulate), exact top-k of the bf16-rounded scores; near-tie
        # orderings can differ from f32, so never the parity default.
        use_pallas = factored and (
            backend in ("pallas", "pallas_bf16")
            or (backend == "auto" and on_tpu)
        )
        # the kernel keeps k + rated_width candidates per user in its
        # SLOTS*LANES stream; datasets with a heavier-rated user than that
        # (e.g. a >1000-rating MovieLens user) fall back to the XLA sweep
        # instead of tripping the kernel's assert
        if use_pallas and not self.sweep.pallas_supported(split, data_type):
            use_pallas = False
        if use_pallas:
            return self.sweep.run_pallas(
                split, data_type, self.user_emb, self.item_emb,
                interpret=not on_tpu, bf16=backend == "pallas_bf16",
            )
        return self.sweep.run(split, data_type, self.batch_scores)

    def valid(self, valid_type: str = "all") -> np.ndarray:
        return self._rec_lists("valid", valid_type)

    def test(self, test_type: str = "all") -> np.ndarray:
        return self._rec_lists("test", test_type)

    def _evaluate_split(
        self, phase: str, data_type: str, rec: np.ndarray, topN
    ):
        split = _SETTING_SPLITS[(data_type, phase)]
        es = self.data.eval_splits[split]
        return ranking_evaluation(
            es.indptr, es.items, rec, topN, self.data.item_num
        )

    def full_evaluation(self, rec: np.ndarray, test_type: str = "warm"):
        measure, perf = self._evaluate_split("test", test_type, rec, self.topN)
        self.result = measure
        if test_type == "warm":
            self.warm_test_results = perf
        elif test_type == "cold":
            self.cold_test_results = perf
        else:
            self.overall_test_results = perf
        print("*" * 80)
        print(
            f"[{test_type} setting] The result of {self.model_name}:\n"
            + "".join(measure)
        )

    def fast_evaluation(self, epoch: int, valid_type: str = "all") -> List[str]:
        print(f"Evaluating the model under the {valid_type} setting...")
        rec = self.valid(valid_type)
        measure, perf = self._evaluate_split(
            "valid", valid_type, rec, [self.max_N]
        )
        performance: Dict[str, float] = dict(zip(_METRIC_NAMES, perf[0]))
        finite = all(math.isfinite(v) for v in performance.values())

        self.events.emit(
            "validation",
            epoch=epoch + 1,
            setting=valid_type,
            **{k.replace(" ", "_").lower(): v for k, v in performance.items()},
        )
        if self.best_performance:
            if not finite:
                if self.early_stop_flag:
                    self.early_stop_patience -= 1
                print(
                    "Warning: validation metrics are non-finite; "
                    "early-stop patience decreased, best checkpoint unchanged."
                )
            else:
                if performance["NDCG"] > self.best_performance[1]["NDCG"]:
                    self.best_performance[1] = performance
                    self.best_performance[0] = epoch + 1
                    self.save()
                    if self.early_stop_flag:
                        self.early_stop_patience = self.max_early_stop_patience
                elif self.early_stop_flag:
                    self.early_stop_patience -= 1
        else:
            if finite:
                self.best_performance = [epoch + 1, performance]
                self.save()
            elif self.early_stop_flag:
                self.early_stop_patience -= 1

        measure_lines = [m.strip() for m in measure[1:]]
        print("-" * 100)
        print(f"Performance (Top-{self.max_N} Recommendation)")
        print("Epoch:", str(epoch + 1) + ",", "  |  ".join(measure_lines))
        if self.best_performance:
            bp = "  |  ".join(
                f"{k}:{v}" for k, v in self.best_performance[1].items()
            )
            print(f"*Best {valid_type} Performance*")
            print("Epoch:", str(self.best_performance[0]) + ",", bp)
        if self.early_stop_flag:
            if self.early_stop_patience <= 0:
                print(f"Stopping early at epoch {epoch + 1}.")
            else:
                print(f"Early stopping patience left: {self.early_stop_patience}.")
        print("-" * 100)
        return measure_lines

    def should_stop(self) -> bool:
        return self.early_stop_flag and self.early_stop_patience <= 0

    # ------------------------------------------------------------------ run
    def run(self):
        self.print_basic_info()
        print("Training Model...")
        self.train()
        if self.epochs_ran == 0 and self.max_epoch > 0:
            self.epochs_ran = self.max_epoch
        for test_type in ["all", "cold", "warm"]:
            print("*" * 80)
            print(f"Testing under [{test_type}] setting...")
            rec = self.test(test_type=test_type)
            self.full_evaluation(rec, test_type=test_type)
        self.events.emit(
            "run_end",
            model=self.model_name,
            epochs_ran=self.epochs_ran,
            train_seconds=round(self.train_end_time - self.train_start_time, 3),
            overall=self.overall_test_results,
            cold=self.cold_test_results,
            warm=self.warm_test_results,
        )
