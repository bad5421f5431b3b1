"""Jitted train/eval steps + the data-parallel training loop.

Replaces the reference's two trainers (PyTorch Lightning and the manual DDP
loop, /root/reference/model/graph_model.py:404-908) with a single design:

  - ONE jitted train step: forward + loss + grad + optimizer update +
    BatchNorm stat update, compiled once and reused for every batch.
  - Data parallelism by sharding: batches arrive sharded over the ('data',)
    mesh, parameters live replicated; XLA emits the gradient all-reduce over
    ICI. There is no DDP wrapper, no GradScaler (bf16 needs no loss
    scaling), no explicit dist.all_reduce — metric reductions fall out of
    the jitted mean over the sharded batch axis, and early stopping reads
    replicated host values (no broadcast, reference :890-898).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..parallel import batch_sharding, data_parallel_mesh, replicated_sharding
from .schedules import beta_schedule, cosine_warm_restarts, make_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


@dataclass
class TrainerConfig:
    lr: float = 1e-4
    grad_clip_norm: float = 0.5
    weight_decay: float = 1e-4
    epochs: int = 50
    kld_beta: float = 1e-5           # reference config.yaml kld_beta
    beta_schedule: str = "constant"
    beta_start: float = 0.0
    beta_end: float = 1.0
    beta_anneal_epochs: int = 100
    beta_cycle_len: int = 1000
    lr_t0_steps: int = 0             # 0 => constant lr
    early_stop_patience: int = 0     # 0 => disabled
    seed: int = 42
    log_every: int = 50
    # compute-precision policy: "fp32" or "bf16" (params always fp32; the
    # reference trains precision='16-mixed', graph_model.py:510 — bf16 on
    # TPU needs no GradScaler because its exponent range equals fp32's)
    precision: str = "fp32"
    # average gradients over k micro-batches before one optimizer step
    # (reference accumulate_grad_batches, graph_model.py:511)
    accumulate_grad_batches: int = 1
    # Adam moment storage: "fp32" (optax stock) or "bf16" (halves the
    # optimizer's HBM sweep over the 92M-param decoder heads — measured
    # 3.4 ms/step at fp32, benchmarks/trace_table.txt)
    moment_dtype: str = "fp32"
    # tensor-parallel threshold on a hybrid ('data','model') mesh: 2-D
    # kernels with output dim >= tp_min_dim shard over 'model' (see
    # parallel.mesh.tensor_parallel_rule); only consulted when the
    # Trainer's mesh has a 'model' axis of size > 1
    tp_min_dim: int = 2048
    # donate the input TrainState to the jitted step: XLA aliases the
    # 94M-param fp32 params + Adam moments in place instead of holding
    # live input AND output copies across the step (~0.8 GB of transient
    # HBM at production size). Off by default because donation deletes
    # the caller's old state — rewind/parity workflows (and several
    # tests) re-step from a saved state object. Production entry points
    # (cli train, bench, dryrun) turn it on.
    donate_state: bool = False
    # stage this many batches ahead onto the device(s) from a background
    # thread (data.prefetch_to_device): host reads/normalize + the
    # device_put transfer overlap device compute instead of serializing
    # into every step (the reference's pinned-memory + prefetch_factor
    # DataLoader setting, hdf5_dataset.py:688-704). 0 disables.
    # Single-process only: multihost batches assemble per-process slices
    # through make_array_from_process_local_data in _put instead.
    prefetch: int = 2
    # run K train steps per jitted dispatch: the fit loop stacks K host
    # batches into (K, B, ...) arrays and the compiled program lax.scans
    # the step body over them on device. Divides the per-dispatch
    # overhead (call round trip + materializing the ~300-leaf TrainState
    # result) by K — measured 918 -> ~85 ms/step on the tunnel-attached
    # dev chip (BASELINE.md round-5 loop attribution); on production
    # hosts it is the standard keep-the-TPU-busy pattern (Keras
    # steps_per_execution). Pick K dividing the steps per epoch: a
    # ragged tail group compiles a second (smaller-K) program once.
    # Single-process loops only; ignored under multihost.
    steps_per_execution: int = 1

    def model_dtype(self):
        import jax.numpy as jnp
        if self.precision == "bf16":
            return jnp.bfloat16
        if self.precision in ("fp32", "float32"):
            return None
        raise ValueError(f"unknown precision: {self.precision!r}")

    def _moment_dtype(self):
        import jax.numpy as jnp
        if self.moment_dtype == "bf16":
            return jnp.bfloat16
        if self.moment_dtype in ("fp32", "float32"):
            return None
        raise ValueError(f"unknown moment_dtype: {self.moment_dtype!r}")


def _stack_batches(iterator: Iterator, k: int) -> Iterator:
    """Group k consecutive batches into one (k, B, ...) stacked batch per
    train field (np.stack = one contiguous host copy). A ragged tail
    yields a smaller stack (which compiles its own K'-step program once)."""
    fields = ("fhr_st", "fhr_ph", "fhr_up_ph", "fhr")

    def stack(buf):
        return {f: np.stack([np.asarray(b[f]) for b in buf]) for f in fields}

    buf = []
    for b in iterator:
        buf.append(b)
        if len(buf) == k:
            yield stack(buf)
            buf = []
    if buf:
        yield stack(buf)


class Trainer:
    """Data-parallel trainer for SeqVaeTeb-family models."""

    def __init__(self, model, config: TrainerConfig = TrainerConfig(),
                 mesh=None, tx=None, normalize_stats=None):
        """normalize_stats: optional {field: FieldStats} (data.load_stats).
        When given, batches arrive RAW — multichannel fields in on-disk
        (B, C, S) layout, nothing normalized — and the log/asinh/z-score
        transforms plus the (B,C,S)->(B,S,C) swap run INSIDE the jitted
        step, where XLA fuses them into the first layer's reads for ~free.
        The host loader (CombinedHDF5Dataset(raw_layout=True,
        normalize_fields=())) then does nothing but decompress bytes:
        measured 2.5x ingest throughput (benchmarks/loader_bench.py). The
        reference burns DataLoader worker processes on the same math
        (hdf5_dataset.py:18-137)."""
        self.model = model
        self.config = config
        self.normalize_stats = normalize_stats
        self.mesh = mesh if mesh is not None else data_parallel_mesh()
        # lstm_schedule="wavefront_pallas" is multi-chip capable: the
        # kernels are batch-parallel, so on a >1-device mesh they run
        # per-shard under shard_map over the 'data' axis (the pallas call
        # itself is opaque to GSPMD — see wavefront_pallas._batch_mesh);
        # weight grads stay in GSPMD-land as ordinary sharded matmuls.
        lr = (cosine_warm_restarts(config.lr, config.lr_t0_steps)
              if config.lr_t0_steps > 0 else config.lr)
        self.tx = tx if tx is not None else make_optimizer(
            lr, config.grad_clip_norm, config.weight_decay,
            moment_dtype=config._moment_dtype())
        if config.accumulate_grad_batches > 1:
            # MultiSteps averages grads over k micro-batches and applies
            # the inner chain once per k: the reference's batch-2 x accum
            # effective-batch recipe (graph_model.py:511)
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=config.accumulate_grad_batches)
        self._beta_fn = beta_schedule(config.beta_schedule, config.beta_start,
                                      config.beta_end,
                                      config.beta_anneal_epochs,
                                      config.beta_cycle_len, config.kld_beta)
        self.history: Dict[str, list] = {}
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._train_multi = None  # built on first train_multi_step use

    # -- state ---------------------------------------------------------------

    def _local_mesh_device(self):
        """First mesh device ADDRESSABLE by this process: in multihost the
        mesh spans global devices and mesh.devices.flat[0] belongs to
        process 0 only — computing under a non-addressable default device
        raises on every other rank."""
        me = jax.process_index()
        for d in self.mesh.devices.flat:
            if d.process_index == me:
                return d
        raise RuntimeError("mesh has no devices addressable by this process")

    def init_state(self, sample_batch: Dict[str, np.ndarray]) -> TrainState:
        # Initialize ON the mesh's platform: creating params on the default
        # device and re-homing them would mean one host round-trip per
        # parameter tensor — pathological when the default device sits
        # behind a network tunnel and the mesh is elsewhere (e.g. CPU tests).
        with jax.default_device(self._local_mesh_device()):
            rng = jax.random.PRNGKey(self.config.seed)
            init_rng, sample_rng, state_rng = jax.random.split(rng, 3)
            def sample(name):
                x = jnp.asarray(sample_batch[name][:1])
                # raw-layout batches arrive (B, C, S); init only needs the
                # model-layout shape
                if self.normalize_stats is not None and x.ndim == 3:
                    x = jnp.swapaxes(x, 1, 2)
                return x

            variables = self.model.init(
                {"params": init_rng, "sample": sample_rng},
                sample("fhr_st"), sample("fhr_ph"), sample("fhr_up_ph"),
                train=False)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", FrozenDict())
            state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                               batch_stats=batch_stats,
                               opt_state=self.tx.init(params), rng=state_rng)
        # replicate across the mesh
        return self.replicate(state)

    def replicate(self, state: TrainState) -> TrainState:
        """Home a (possibly host-resident, e.g. checkpoint-restored)
        TrainState onto the mesh: replicated on a pure-DP mesh; on a
        hybrid ('data', 'model') mesh, wide 2-D kernels (the decoder
        heads) and their same-shaped optimizer moments are tensor-
        parallel per `tensor_parallel_rule`. In multihost the mesh spans
        non-addressable devices, so each process contributes its
        (identical, same-seed/same-checkpoint) local copy of every leaf
        instead of a plain device_put."""
        if ("model" in self.mesh.axis_names
                and self.mesh.shape["model"] > 1):
            from ..parallel.mesh import tensor_parallel_rule
            rule = tensor_parallel_rule(self.mesh,
                                        min_dim=self.config.tp_min_dim)
        else:
            sh = replicated_sharding(self.mesh)
            rule = lambda x: sh
        if jax.process_count() > 1:
            host = jax.device_get(state)
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    rule(x), np.asarray(x)), host)
        return jax.tree.map(lambda x: jax.device_put(x, rule(x)), state)

    # -- steps ---------------------------------------------------------------

    def _prep(self, y_st, y_ph, x_ph, y_raw):
        """Traced batch preprocessing: identity unless normalize_stats is
        set, in which case raw (B, C, S) fields are normalized on device
        and swapped to the model's (B, S, C) layout."""
        if self.normalize_stats is None:
            return y_st, y_ph, x_ph, y_raw
        from ..data.normalize import normalize_field
        st = self.normalize_stats

        def mc(x, name):
            if name in st:
                x = normalize_field(x, name, st[name], channel_axis=-2)
            return jnp.swapaxes(x, 1, 2)

        if "fhr" in st:
            y_raw = normalize_field(y_raw, "fhr", st["fhr"])
        return (mc(y_st, "fhr_st"), mc(y_ph, "fhr_ph"),
                mc(x_ph, "fhr_up_ph"), y_raw)

    def _train_body(self, state: TrainState, y_st, y_ph, x_ph, y_raw, beta):
        """Traced single-step body shared by the per-step program and the
        steps_per_execution lax.scan program."""
        model, tx = self.model, self.tx
        y_st, y_ph, x_ph, y_raw = self._prep(y_st, y_ph, x_ph, y_raw)
        rng, sample_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                y_st, y_ph, x_ph, train=True,
                rngs={"sample": sample_rng}, mutable=["batch_stats"])
            losses = model.compute_loss(out, y_st, y_ph, y_raw, beta=beta)
            return losses["total_loss"], (losses, updates)

        (_, (losses, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        new_state = state.replace(
            step=state.step + 1, params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=opt_state, rng=rng)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def _build_train_step(self):
        body = self._train_body
        donate = (0,) if self.config.donate_state else ()

        @partial(jax.jit, donate_argnums=donate)
        def train_step(state: TrainState, y_st, y_ph, x_ph, y_raw, beta):
            return body(state, y_st, y_ph, x_ph, y_raw, beta)

        return train_step

    def _build_train_multi(self):
        """K steps per dispatch: scan the step body over a (K, B, ...)
        batch stack entirely on device. One call, one TrainState result,
        stacked (K,) metrics — the per-dispatch overhead that dominates
        the naive per-step loop (BASELINE.md round-5 loop attribution)
        is paid once per K steps."""
        body = self._train_body
        donate = (0,) if self.config.donate_state else ()

        @partial(jax.jit, donate_argnums=donate)
        def train_multi(state: TrainState, y_st, y_ph, x_ph, y_raw, beta):
            def scan_body(s, xs):
                return body(s, *xs, beta)

            return jax.lax.scan(scan_body, state, (y_st, y_ph, x_ph, y_raw))

        return train_multi

    def _build_eval_step(self):
        model = self.model
        prep = self._prep

        @jax.jit
        def eval_step(state: TrainState, y_st, y_ph, x_ph, y_raw, beta):
            y_st, y_ph, x_ph, y_raw = prep(y_st, y_ph, x_ph, y_raw)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                y_st, y_ph, x_ph, train=False, deterministic=True)
            return model.compute_loss(out, y_st, y_ph, y_raw, beta=beta)

        return eval_step

    def _put(self, batch) -> Dict[str, jnp.ndarray]:
        sh = batch_sharding(self.mesh)
        if jax.process_count() > 1:
            # multi-host: each process contributes its local slice of the
            # global batch (the loader's shard slicing guarantees disjoint,
            # equal-size per-process batches)
            return {k: jax.make_array_from_process_local_data(
                        sh, np.asarray(batch[k]))
                    for k in ("fhr_st", "fhr_ph", "fhr_up_ph", "fhr")}
        # prefetched batches arrive as jax Arrays already in the target
        # sharding — device_put passes them through; np.asarray would drag
        # them back to host, so only coerce host-side data
        return {k: jax.device_put(batch[k] if isinstance(batch[k], jax.Array)
                                  else np.asarray(batch[k]), sh)
                for k in ("fhr_st", "fhr_ph", "fhr_up_ph", "fhr")}

    def train_step(self, state: TrainState, batch, beta: float):
        b = self._put(batch)
        return self._train_step(state, b["fhr_st"], b["fhr_ph"],
                                b["fhr_up_ph"], b["fhr"], beta)

    def eval_step(self, state: TrainState, batch, beta: float):
        b = self._put(batch)
        return self._eval_step(state, b["fhr_st"], b["fhr_ph"],
                               b["fhr_up_ph"], b["fhr"], beta)

    def train_multi_step(self, state: TrainState, stacked_batch, beta: float):
        """Run K = leading-axis steps in ONE dispatch. stacked_batch fields
        are (K, B, ...) stacks of K consecutive batches (np.stack of what
        train_step takes). Returns (state, metrics) with each metric a
        (K,) array, step k of which equals what K sequential train_step
        calls would have produced (exact-parity-tested,
        tests/test_train.py::test_steps_per_execution_parity)."""
        from ..parallel import stacked_batch_sharding
        if self._train_multi is None:
            self._train_multi = self._build_train_multi()
        sh = stacked_batch_sharding(self.mesh)
        b = {k: jax.device_put(stacked_batch[k]
                               if isinstance(stacked_batch[k], jax.Array)
                               else np.asarray(stacked_batch[k]), sh)
             for k in ("fhr_st", "fhr_ph", "fhr_up_ph", "fhr")}
        return self._train_multi(state, b["fhr_st"], b["fhr_ph"],
                                 b["fhr_up_ph"], b["fhr"], beta)

    # -- loop ----------------------------------------------------------------

    def fit(self, state: TrainState,
            train_batches: Callable[[int], Iterator],
            val_batches: Optional[Callable[[int], Iterator]] = None,
            epochs: Optional[int] = None,
            checkpointer=None,
            log_fn: Callable[[str], None] = print,
            callbacks: Sequence = (),
            start_epoch: int = 0) -> TrainState:
        """Run the training loop.

        train_batches/val_batches: epoch index -> batch iterator (so each
        epoch reshuffles with a new seed, like DistributedSampler.set_epoch).
        checkpointer: optional train.checkpoint.Checkpointer, saves best-k
        on val total loss.
        callbacks: objects with on_epoch_end(trainer, state, epoch) /
        on_fit_end(trainer, state); exceptions are logged, never fatal.
        start_epoch: resume point — epochs run [start_epoch, epochs).
        """
        cfg = self.config
        best_val = float("inf")
        bad_epochs = 0
        for epoch in range(start_epoch,
                           epochs if epochs is not None else cfg.epochs):
            beta = self._beta_fn(epoch)
            t0 = time.time()
            train_metrics = []
            n_windows = 0
            batches = train_batches(epoch)
            # K steps per dispatch (single-process loops): stack K host
            # batches and lax.scan the step on device — the per-dispatch
            # overhead (round trip + TrainState-result materialization,
            # the dominant loop cost in BASELINE.md's round-5 attribution)
            # is paid once per K steps instead of every step
            spe = (cfg.steps_per_execution
                   if jax.process_count() == 1 else 1)
            if spe > 1:
                batches = _stack_batches(batches, spe)
            if cfg.prefetch > 0 and jax.process_count() == 1:
                # background thread stages device transfers ahead; _put
                # passes already-placed arrays through untouched
                from ..data.dataset import prefetch_to_device
                from ..parallel import stacked_batch_sharding
                batches = prefetch_to_device(
                    batches, size=cfg.prefetch,
                    sharding=(stacked_batch_sharding(self.mesh) if spe > 1
                              else batch_sharding(self.mesh)),
                    array_fields=("fhr_st", "fhr_ph", "fhr_up_ph", "fhr"))
            for i, batch in enumerate(batches):
                if spe > 1:
                    # (K, B) windows per stacked dispatch; the tail stack
                    # may carry K' < K
                    n_windows += int(np.shape(batch["fhr"])[0] *
                                     np.shape(batch["fhr"])[1])
                    state, metrics = self.train_multi_step(state, batch,
                                                           beta)
                else:
                    n_windows += int(np.shape(batch["fhr"])[0])
                    state, metrics = self.train_step(state, batch, beta)
                train_metrics.append(metrics)
            # per-key ravel+concat: entries are scalars (per-step) or (K,)
            # stacks (per-dispatch), weighted equally per step either way
            train_avg = {k: float(np.mean(np.concatenate(
                [np.ravel(np.asarray(m[k])) for m in train_metrics])))
                for k in train_metrics[0]} if train_metrics else {}
            epoch_time = time.time() - t0
            win_rate = n_windows / epoch_time if epoch_time > 0 else 0.0

            val_avg = {}
            if val_batches is not None:
                val_metrics = [self.eval_step(state, b, beta)
                               for b in val_batches(epoch)]
                val_avg = {k: float(np.mean([m[k] for m in val_metrics]))
                           for k in val_metrics[0]} if val_metrics else {}

            self.history.setdefault("epoch", []).append(epoch)
            self.history.setdefault("beta", []).append(beta)
            self.history.setdefault("epoch_time", []).append(epoch_time)
            self.history.setdefault("windows_per_sec", []).append(win_rate)
            for k, v in train_avg.items():
                self.history.setdefault(f"train/{k}", []).append(v)
            for k, v in val_avg.items():
                self.history.setdefault(f"val/{k}", []).append(v)

            log_fn(f"epoch {epoch}: "
                   f"train {train_avg.get('total_loss', float('nan')):.4f} "
                   f"val {val_avg.get('total_loss', float('nan')):.4f} "
                   f"beta {beta:.2e} ({epoch_time:.1f}s, "
                   f"{win_rate:.0f} win/s)")

            monitored = val_avg.get("total_loss",
                                    train_avg.get("total_loss", float("inf")))
            # Rank-0-only save: in multihost every process sees the same
            # replicated state, and concurrent writes to the same Orbax step
            # path / index.json would race on shared storage (the reference's
            # ModelCheckpoint is likewise rank-coordinated).
            if checkpointer is not None and jax.process_index() == 0:
                checkpointer.save(state, step=epoch, metric=monitored)
            for cb in callbacks:
                try:
                    cb.on_epoch_end(self, state, epoch)
                except Exception as e:  # plots must never kill training
                    log_fn(f"callback {type(cb).__name__} failed at epoch "
                           f"{epoch}: {e!r}")
            if monitored < best_val - 1e-12:
                best_val = monitored
                bad_epochs = 0
            else:
                bad_epochs += 1
                if cfg.early_stop_patience and bad_epochs >= cfg.early_stop_patience:
                    log_fn(f"early stop at epoch {epoch} "
                           f"(no improvement for {bad_epochs} epochs)")
                    break
        for cb in callbacks:
            try:
                cb.on_fit_end(self, state)
            except Exception as e:
                log_fn(f"callback {type(cb).__name__} on_fit_end failed: "
                       f"{e!r}")
        return state
