"""Training-time callbacks: per-N-epoch reconstruction plots, rolling loss
curves, history persistence.

The reference runs these as Lightning callbacks
(/root/reference/model/pytorch_lightning_modules.py:27-279 PlottingCallBack,
:282-381 LossPlotCallback, :384-398 MetricsLoggingCallback); here they are
plain objects with an `on_epoch_end(trainer, state, epoch)` hook called by
Trainer.fit after each epoch's metrics land. A failing callback is logged
and skipped — visualization must never kill a training run.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np


class Callback:
    """Base hook protocol for Trainer.fit."""

    def on_epoch_end(self, trainer, state, epoch: int) -> None:  # pragma: no cover
        pass

    def on_fit_end(self, trainer, state) -> None:  # pragma: no cover
        pass


class LossCurveCallback(Callback):
    """Rewrite the loss-curve figure every `every` epochs so a live run has
    an up-to-date plot (reference LossPlotCallback, :282-381, which rewrote
    a plotly HTML each validation epoch)."""

    def __init__(self, out_path: str, every: int = 1):
        self.out_path = out_path
        self.every = max(1, every)

    def on_epoch_end(self, trainer, state, epoch: int) -> None:
        if epoch % self.every:
            return
        from ..eval.plots import plot_loss_curves
        plot_loss_curves(trainer.history, self.out_path)

    def on_fit_end(self, trainer, state) -> None:
        from ..eval.plots import plot_loss_curves
        plot_loss_curves(trainer.history, self.out_path)


class HistoryCallback(Callback):
    """Persist trainer.history each epoch so an interrupted run keeps its
    metric trail (the reference only pickled history after fit returned,
    graph_model.py:599-604)."""

    def __init__(self, path: str):
        self.path = path

    def _dump(self, trainer) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(trainer.history, f)
        os.replace(tmp, self.path)

    def on_epoch_end(self, trainer, state, epoch: int) -> None:
        self._dump(trainer)

    def on_fit_end(self, trainer, state) -> None:
        self._dump(trainer)


class MemoryMonitorCallback(Callback):
    """Per-epoch HBM watcher (reference MemoryMonitorCallback,
    /root/reference/model/pytorch_lightning_modules.py:567-638).

    On TPU there is no allocator cache to empty_cache() — XLA owns HBM for
    the life of the client — so the actionable equivalents are (a) record
    the per-epoch live/peak HBM per device into trainer.history, and (b)
    warn through log_fn when usage crosses `threshold_fraction` of the
    device limit (the early signal that the next larger batch/config will
    RESOURCE_EXHAUSTED). Devices that report no memory_stats (e.g. the CPU
    backend) are skipped silently.
    """

    def __init__(self, threshold_fraction: float = 0.9,
                 log_fn=print):
        self.threshold_fraction = threshold_fraction
        self.log_fn = log_fn
        self.peaks_mb: list = []

    def on_epoch_end(self, trainer, state, epoch: int) -> None:
        from ..utils.profiling import device_memory_stats
        stats = device_memory_stats()
        in_use = [s["mb_in_use"] for s in stats.values() if "mb_in_use" in s]
        peaks = [s.get("peak_mb_in_use", 0.0) for s in stats.values()
                 if "mb_in_use" in s]
        if not in_use:
            return
        trainer.history.setdefault("hbm_mb_in_use", []).append(max(in_use))
        trainer.history.setdefault("hbm_peak_mb", []).append(max(peaks))
        for dev, s in stats.items():
            limit = s.get("mb_limit")
            if limit and s.get("mb_in_use", 0.0) > self.threshold_fraction * limit:
                self.log_fn(
                    f"memory monitor: {dev} at "
                    f"{s['mb_in_use']:.0f}/{limit:.0f} MB "
                    f"(> {100 * self.threshold_fraction:.0f}% threshold) "
                    f"at epoch {epoch}")
        self.peaks_mb.append(max(peaks))


class ReconstructionPlotCallback(Callback):
    """Every `every` epochs, run the current model on one held-out batch and
    write a reconstruction figure (reference PlottingCallBack: val-batch
    reconstruction PDF every plot_frequency epochs, rank-0 only, :27-279).

    batch: dict with fhr_st / fhr_ph / fhr_up_ph / fhr arrays (normalized,
    model-ready). Plots the first `max_samples` rows.
    """

    def __init__(self, out_dir: str, batch: Dict[str, np.ndarray],
                 every: int = 10, max_samples: int = 2):
        self.out_dir = out_dir
        self.batch = batch
        self.every = max(1, every)
        self.max_samples = max_samples
        os.makedirs(out_dir, exist_ok=True)

    def on_epoch_end(self, trainer, state, epoch: int) -> None:
        if epoch % self.every:
            return
        from ..eval.plots import plot_vae_reconstruction
        import jax
        import jax.numpy as jnp
        b = self.batch
        k = min(self.max_samples, len(b["fhr"]))
        # Fetch the replicated params to host first: in multihost the state
        # holds global (non-fully-addressable-per-process) arrays, and
        # applying them directly against local inputs raises every epoch.
        variables = jax.device_get(
            {"params": state.params, "batch_stats": state.batch_stats})
        # Run the plot forward jitted ON THE HOST CPU: a 2-sample eval pass
        # neither needs the training device nor tolerates eager per-op
        # dispatch through a remote-device tunnel (thousands of round
        # trips); CPU also sidesteps multihost global-array placement.
        try:
            plot_dev = jax.devices("cpu")[0]
        except RuntimeError:
            plot_dev = jax.devices()[0]
        apply_fn = jax.jit(
            lambda v, a, c, d: trainer.model.apply(
                v, a, c, d, train=False, deterministic=True))
        with jax.default_device(plot_dev):
            out = apply_fn(
                variables,
                jnp.asarray(b["fhr_st"][:k]), jnp.asarray(b["fhr_ph"][:k]),
                jnp.asarray(b["fhr_up_ph"][:k]))
        mu = np.asarray(out["mu_pr"], np.float32)
        logvar = np.asarray(out["logvar_pr"], np.float32)
        for i in range(k):
            plot_vae_reconstruction(
                np.asarray(b["fhr"][i]), mu[i], logvar[i],
                os.path.join(self.out_dir,
                             f"reconstruction_epoch{epoch:04d}_s{i}.png"),
                title=f"epoch {epoch} sample {i}")
