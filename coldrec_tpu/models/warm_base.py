"""Shared trainer skeleton for warm CF backbones.

All six warm backbones in the reference (MF.py, LightGCN.py, NGCF.py,
SimGCL.py, XSimGCL.py, NCL.py) use the identical loop: epoch over
``next_batch_pairwise``, full-table forward, BPR(+extras) loss, Adam,
per-epoch ``fast_evaluation('all')``, early-stop break, save best tables to
the embedding bus. Subclasses provide parameter init, the loss function and
the full-table forward; everything else lives here once.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sampler import pairwise_batches
from ..runtime.checkpoints import save_embeddings
from ..runtime.trainer import BaseColdStartTrainer
from .common import adam, dot_scores, make_train_step


class WarmBackboneTrainer(BaseColdStartTrainer):
    """Subclass contract:

    * ``self.params`` initialized in __init__
    * ``loss_fn(params, batch, key) -> scalar``  (key for stochastic models)
    * ``forward_tables(params) -> (user_emb, item_emb)`` full eval tables
    * optionally override ``epoch_hook(epoch)`` (e.g. NCL's e-step)
    """

    uses_rng_in_loss = False
    # stateful=True: the model threads non-trainable buffers (e.g. BatchNorm
    # running stats) — loss_fn(params, state, batch, key) -> (loss, new_state)
    # and forward_tables(params, state).
    stateful = False
    # class defaults so models with custom setup_optimizer (which skip
    # _setup_mesh) still run the single-device path
    mesh = None
    _batch_sharding = None
    # set True only by the DEFAULT stateless setup_optimizer below:
    # --fused_steps replays self.loss_fn + self.optimizer inside a scan,
    # so models with custom optimizer structures (VBPR/MTPR multi-opt,
    # CGRC/FSGNN/ALDI/M2VAE bespoke steps) must keep the per-batch loop
    # even when the flag is passed
    _fused_ok = False

    # ------------------------------------------------------------- sharding
    def _setup_mesh(self):
        """Parse --mesh "DxM" into a Mesh + shardings (SURVEY §2.5).

        Embedding tables (leaves whose leading dim is user_num/item_num) are
        row-sharded over the model axis when divisible, everything else is
        replicated; batches shard over the data axis. On one device or with
        --mesh unset this is a no-op and the single-chip path runs.

        Under a multi-process group (SURVEY §5.8; main.py calls
        init_distributed first) the mesh spans ALL global devices — --mesh
        unset defaults to pure DP over them — and placement goes through
        host_to_global (per-process addressable-shard feeding) because
        device_put of a host array cannot target non-addressable devices.
        """
        self.mesh = None
        self._batch_sharding = None
        import jax

        multiproc = jax.process_count() > 1
        spec = str(getattr(self.args, "mesh", "") or "")
        if not spec and not multiproc:
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.distributed import host_to_global
        from ..parallel.mesh import AXIS_DATA, AXIS_MODEL, make_mesh

        if spec:
            n_data, n_model = (int(x) for x in spec.lower().split("x"))
        else:  # multi-process default: DP over every global device
            n_data, n_model = len(jax.devices()), 1
        self.mesh = make_mesh(n_data, n_model)
        self._batch_sharding = NamedSharding(self.mesh, P(AXIS_DATA))
        rep = NamedSharding(self.mesh, P())
        row = NamedSharding(self.mesh, P(AXIS_MODEL, None))
        table_rows = {self.data.user_num, self.data.item_num}

        def place(x):
            if (
                hasattr(x, "ndim")
                and x.ndim == 2
                and x.shape[0] in table_rows
                and x.shape[0] % n_model == 0
            ):
                return host_to_global(x, row)
            return host_to_global(x, rep)

        self.params = jax.tree_util.tree_map(place, self.params)
        if getattr(self, "net_state", None) is not None:
            self.net_state = jax.tree_util.tree_map(
                lambda x: host_to_global(x, rep), self.net_state
            )

    def build_graph(self):
        """Normalized-adjacency SpMM operator for the LightGCN family:
        mesh-sharded (rows+edges over the model axis, SURVEY §2.5 "SpMM
        sharding") when --mesh has a model axis > 1, otherwise the hybrid
        ELL+COO single-chip path with the symmetric custom VJP."""
        from ..ops.spmm import make_sym_spmm

        spec = str(getattr(self.args, "mesh", "") or "")
        if spec:
            n_data, n_model = (int(v) for v in spec.lower().split("x"))
            if n_model > 1:
                from ..parallel.mesh import make_mesh
                from ..parallel.ops import make_mesh_graph

                return make_mesh_graph(
                    make_mesh(n_data, n_model),
                    self.data.norm_adj,
                    self.data.user_num + self.data.item_num,
                )
        return make_sym_spmm(self.data.norm_adj)

    def _place_batch(self, batch):
        if self._batch_sharding is None:
            return batch
        from ..parallel.distributed import host_to_global

        # host_to_global feeds each process's addressable rows only, so the
        # identical-per-process host batch survives a multi-process mesh
        return {
            k: host_to_global(v, self._batch_sharding)
            for k, v in batch.items()
        }

    def setup_optimizer(self):
        self._setup_mesh()
        self.optimizer = adam(self.lr)
        self.opt_state = self.optimizer.init(self.params)
        if self.stateful:
            from .common import make_train_step_aux

            if self.uses_rng_in_loss:
                self._step = make_train_step_aux(self.loss_fn, self.optimizer)
            else:
                def loss_no_key(params, state, batch):
                    return self.loss_fn(params, state, batch, None)

                self._step = make_train_step_aux(loss_no_key, self.optimizer)
            self._forward_jit = self._make_forward_jit()
            self.user_emb, self.item_emb = self._local_tables(
                *self._forward_jit(self.params, self.net_state)
            )
        else:
            if self.uses_rng_in_loss:
                self._step = make_train_step(self.loss_fn, self.optimizer)
            else:
                def loss_no_key(params, batch):
                    return self.loss_fn(params, batch, None)

                self._step = make_train_step(loss_no_key, self.optimizer)
            self._forward_jit = self._make_forward_jit()
            self.user_emb, self.item_emb = self._local_tables(
                *self._forward_jit(self.params)
            )
            self._fused_ok = True  # default stateless step structure
        self.best_user_emb, self.best_item_emb = self.user_emb, self.item_emb
        self._score_fn = None
        self._fused_step = None

    # ---------------------------------------------------------- fused steps
    def _use_fused(self) -> int:
        """--fused_steps K (>1) folds K consecutive train steps into ONE
        device program (lax.scan over host-stacked batches): the step math,
        batch order, optimizer updates, and PRNG key sequence are identical
        to the per-batch loop (equivalence proven in
        tools/exp_fused_steps.py and tests/test_fused_steps.py), but the
        per-step dispatch and batch-transfer round trips amortize K-fold —
        they dominate small-step models under remote dispatch. Scoped to
        the stateless single-process path; stateful models (BatchNorm
        buffers) and mesh/multi-process runs use the per-batch loop."""
        k = int(getattr(self.args, "fused_steps", 0) or 0)
        if (
            k > 1
            and self._fused_ok
            and not self.stateful
            and self._batch_sharding is None
            and jax.process_count() == 1
        ):
            return k
        return 0

    def _make_fused_step(self):
        import optax

        loss_fn = self.loss_fn
        optimizer = self.optimizer
        with_rng = self.uses_rng_in_loss

        def body(carry, xs):
            p, o = carry
            b, key = xs if with_rng else (xs, None)
            loss, grads = jax.value_and_grad(loss_fn)(p, b, key)
            updates, o = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        def fused(params, opt_state, bs, keys=None):
            xs = (bs, keys) if with_rng else bs
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), xs
            )
            return params, opt_state, losses

        return jax.jit(fused, donate_argnums=(0, 1))

    def _run_fused_group(self, group, epoch: int, n0: int) -> int:
        """One fused dispatch over len(group) stacked batches; returns the
        next batch index. Loss prints keep the per-50-batch cadence."""
        if getattr(self, "_fused_step", None) is None:
            self._fused_step = self._make_fused_step()
        stacked = {
            k: jnp.asarray(np.stack([b[k] for b in group]))
            for k in group[0]
        }
        if self.uses_rng_in_loss:
            # same sequential key derivation as the per-batch loop
            keys = jnp.stack([self.next_key() for _ in group])
            self.params, self.opt_state, losses = self._fused_step(
                self.params, self.opt_state, stacked, keys
            )
        else:
            self.params, self.opt_state, losses = self._fused_step(
                self.params, self.opt_state, stacked
            )
        for i in range(len(group)):
            n = n0 + i
            if n % 50 == 0:
                print(
                    f"training: {epoch + 1} batch {n} "
                    f"batch_loss: {float(losses[i]):.5f}"
                )
        return n0 + len(group)

    def _local_tables(self, ue, ie):
        """Eval tables must be process-local: the eval sweep partitions
        user chunks per host and scores them with local programs, so a
        global (possibly non-addressable) forward output is localized
        first (identity in single-process runs)."""
        from ..parallel.distributed import localize

        return localize(ue), localize(ie)

    def _make_forward_jit(self):
        """Hook: models whose forward closes over very large device arrays
        (which would lower to HLO constants and overflow the remote
        compile request) override this to pass them as arguments
        (see FSGNN)."""
        return jax.jit(self.forward_tables)

    # ------------------------------------------------------------- contract
    def loss_fn(self, params, batch, key):  # pragma: no cover - abstract
        raise NotImplementedError

    def forward_tables(self, params) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def epoch_hook(self, epoch: int):
        pass

    def extra_saved_tensors(self) -> Dict[str, np.ndarray]:
        return {}

    def batches(self):
        """Per-epoch batch iterator; override for model-specific samplers."""
        return pairwise_batches(self.data, self.batch_size, self.host_rng)

    # ------------------------------------------------------------- resume
    def _ckpt_path(self) -> str:
        return str(getattr(self.args, "state_ckpt", "") or "")

    def _save_train_state(self, epoch: int):
        from ..runtime.checkpoints import save_train_state

        state = {
            "epoch": epoch,
            "params": self.params,
            "opt_state": self.opt_state,
            "net_state": getattr(self, "net_state", None),
            "rng_key": self.rng_key,
            "host_rng_state": self.host_rng.bit_generator.state,
            "best_user_emb": self.best_user_emb,
            "best_item_emb": self.best_item_emb,
            "best_performance": self.best_performance,
            "early_stop_patience": getattr(self, "early_stop_patience", None),
        }
        save_train_state(self._ckpt_path(), state)

    def _try_resume(self) -> int:
        """Restore mid-training state; returns the epoch to resume from."""
        from ..runtime.checkpoints import load_train_state

        path = self._ckpt_path()
        if not path:
            return 0
        state = load_train_state(path)
        if state is None:
            return 0
        import jax.numpy as jnp

        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        self.opt_state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if hasattr(x, "shape") else x,
            state["opt_state"],
        )
        if state.get("net_state") is not None:
            self.net_state = jax.tree_util.tree_map(
                jnp.asarray, state["net_state"]
            )
        self.rng_key = jnp.asarray(state["rng_key"])
        self.host_rng.bit_generator.state = state["host_rng_state"]
        self.best_user_emb = jnp.asarray(state["best_user_emb"])
        self.best_item_emb = jnp.asarray(state["best_item_emb"])
        self.best_performance = state["best_performance"]
        if state.get("early_stop_patience") is not None and self.early_stop_flag:
            self.early_stop_patience = state["early_stop_patience"]
        if self.mesh is not None:
            # restored host arrays land unsharded; re-apply the mesh layout
            self._setup_mesh()
        print(f"resumed training state from {path} at epoch {state['epoch'] + 1}")
        return int(state["epoch"]) + 1

    # ----------------------------------------------------------------- loop
    def train(self):
        self.timer(start=True)
        start_epoch = self._try_resume()
        epoch = start_epoch - 1
        fused_k = self._use_fused()
        for epoch in range(start_epoch, self.max_epoch):
            self.epoch_hook(epoch)
            if fused_k:
                n, group = 0, []
                for batch in self.batches():
                    group.append(batch)
                    if len(group) == fused_k:
                        n = self._run_fused_group(group, epoch, n)
                        group = []
                for batch in group:  # tail < K: per-batch steps
                    if self.uses_rng_in_loss:
                        self.params, self.opt_state, loss = self._step(
                            self.params, self.opt_state, batch, self.next_key()
                        )
                    else:
                        self.params, self.opt_state, loss = self._step(
                            self.params, self.opt_state, batch
                        )
                    if n % 50 == 0:
                        print(
                            f"training: {epoch + 1} batch {n} "
                            f"batch_loss: {float(loss):.5f}"
                        )
                    n += 1
            for n, batch in enumerate(() if fused_k else self.batches()):
                batch = self._place_batch(batch)
                if self.stateful:
                    extra = (self.next_key(),) if self.uses_rng_in_loss else ()
                    (
                        self.params,
                        self.opt_state,
                        self.net_state,
                        loss,
                    ) = self._step(
                        self.params, self.opt_state, self.net_state, batch, *extra
                    )
                elif self.uses_rng_in_loss:
                    self.params, self.opt_state, loss = self._step(
                        self.params, self.opt_state, batch, self.next_key()
                    )
                else:
                    self.params, self.opt_state, loss = self._step(
                        self.params, self.opt_state, batch
                    )
                if n % 50 == 0:
                    print(
                        f"training: {epoch + 1} batch {n} "
                        f"batch_loss: {float(loss):.5f}"
                    )
            if self.stateful:
                self.user_emb, self.item_emb = self._local_tables(
                    *self._forward_jit(self.params, self.net_state)
                )
            else:
                self.user_emb, self.item_emb = self._local_tables(
                    *self._forward_jit(self.params)
                )
            self._score_fn = None
            if epoch % self.eval_every == 0:
                self.fast_evaluation(epoch, valid_type="all")
                if self.should_stop():
                    break
            if self._ckpt_path():
                from ..parallel.distributed import process_index

                if process_index() == 0:  # rank-0 checkpoint writer
                    self._save_train_state(epoch)
        self.epochs_ran = (epoch + 1) if self.max_epoch > 0 else 0
        self.timer(start=False)
        self.user_emb, self.item_emb = self.best_user_emb, self.best_item_emb
        self._score_fn = None
        from ..parallel.distributed import process_index

        if self.args.save_emb and process_index() == 0:
            tensors = {
                "user_emb": np.asarray(self.user_emb),
                "item_emb": np.asarray(self.item_emb),
            }
            tensors.update(self.extra_saved_tensors())
            save_embeddings(
                self.args.emb_dir,
                self.dataset_name,
                self.args.cold_object,
                self.model_name,
                tensors,
                fmt=getattr(self.args, "save_emb_format", "npz"),
            )

    def save(self):
        self.best_user_emb = self.user_emb
        self.best_item_emb = self.item_emb

    def batch_scores(self, user_ids: np.ndarray) -> jnp.ndarray:
        if self._score_fn is None:
            self._score_fn = dot_scores(self.user_emb, self.item_emb)
        return self._score_fn(jnp.asarray(user_ids))
