"""Classifier training: frozen-VAE InceptionTime head + k-fold workflow.

Clean realization of the reference's classification pathway: the
SeqVaeTebClassifier wrapper (/root/reference/model/vae_teb_model.py:1248-1526)
trained per fold as documented by the (non-runnable) legacy driver
(/root/reference/model/graph_model_refactored_cls.py:597,737) with optional
LDAM class-imbalance loss (predict_st pytorch_lightning_modules.py:92-143).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from ..models import SeqVaeTebClassifier, ldam_loss
from ..parallel import batch_sharding, data_parallel_mesh, replicated_sharding
from .checkpoint import transfer_params
from .trainer import TrainState


@dataclass
class ClassifierConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-4
    grad_clip_norm: float = 1.0
    epochs: int = 20
    loss: str = "ce"                 # 'ce' or 'ldam'
    cls_num_list: Optional[Sequence[int]] = None  # needed for ldam
    ldam_max_m: float = 0.5
    ldam_s: float = 30.0
    vae_loss_weight: float = 0.0     # >0 adds the VAE ELBO (reference 0.1)
    seed: int = 0


class ClassifierTrainer:
    """Data-parallel trainer for SeqVaeTebClassifier."""

    def __init__(self, model: SeqVaeTebClassifier,
                 config: ClassifierConfig = ClassifierConfig(), mesh=None):
        self.model = model
        self.config = config
        # joint fine-tuning (reference vae_teb_model.py:1440-1468: CE +
        # 0.1*ELBO with the VAE unfrozen) — a weighted VAE term against a
        # frozen VAE would silently train nothing, so reject the combination
        self.joint = config.vae_loss_weight > 0
        if self.joint and model.freeze_vae:
            raise ValueError(
                "vae_loss_weight > 0 requires SeqVaeTebClassifier("
                "freeze_vae=False): the reference's joint mode fine-tunes "
                "the VAE (vae_teb_model.py:1440-1468)")
        self.mesh = mesh if mesh is not None else data_parallel_mesh()
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip_norm),
            optax.adamw(config.lr, weight_decay=config.weight_decay))
        self.history: Dict[str, list] = {}
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def init_state(self, sample_batch,
                   pretrained_vae_params=None) -> TrainState:
        cfg = self.config
        with jax.default_device(self.mesh.devices.flat[0]):
            rng = jax.random.PRNGKey(cfg.seed)
            k_init, k_sample, k_drop, k_state = jax.random.split(rng, 4)
            variables = self.model.init(
                {"params": k_init, "sample": k_sample, "dropout": k_drop},
                jnp.asarray(sample_batch["fhr_st"][:1]),
                jnp.asarray(sample_batch["fhr_ph"][:1]),
                jnp.asarray(sample_batch["fhr_up_ph"][:1]),
                train=False)
            params = variables["params"]
            if pretrained_vae_params is not None:
                # checkpoint surgery: load the VAE weights into the wrapper
                # (reference load_pretrained_vae, vae_teb_model.py:1323-1347)
                params, copied = transfer_params(pretrained_vae_params,
                                                 params,
                                                 dst_prefix=("vae_model",))
                if not copied:
                    raise ValueError("no VAE parameters matched the wrapper")
            state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                               batch_stats=variables.get("batch_stats",
                                                         FrozenDict()),
                               opt_state=self.tx.init(params), rng=k_state)
        return jax.device_put(state, replicated_sharding(self.mesh))

    def _loss(self, logits, labels):
        cfg = self.config
        if cfg.loss == "ldam":
            if cfg.cls_num_list is None:
                raise ValueError("ldam loss needs cls_num_list")
            return ldam_loss(logits, labels, tuple(cfg.cls_num_list),
                             cfg.ldam_max_m, cfg.ldam_s)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()

    def _build_train_step(self):
        model, tx, cfg, joint = self.model, self.tx, self.config, self.joint

        @jax.jit
        def step(state: TrainState, y_st, y_ph, x_ph, labels, y_raw):
            rng, k_sample, k_drop = jax.random.split(state.rng, 3)

            def loss_fn(params):
                out, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    y_st, y_ph, x_ph, train=True,
                    rngs={"sample": k_sample, "dropout": k_drop},
                    mutable=["batch_stats"])
                # the model's loss contract (CE + w*ELBO, reference
                # vae_teb_model.py:1440-1468); LDAM swaps the CE term only
                losses = SeqVaeTebClassifier.compute_loss(
                    out, labels, y_st=y_st, y_ph=y_ph, y_raw=y_raw,
                    compute_vae_loss=joint,
                    vae_loss_weight=cfg.vae_loss_weight)
                if cfg.loss == "ldam":
                    cls = self._loss(out["logits"], labels)
                    losses["classification_loss"] = cls
                    losses["total_loss"] = (
                        cls + cfg.vae_loss_weight * losses["vae_loss"])
                acc = (out["predictions"] == labels).mean()
                return losses["total_loss"], (losses, acc, updates)

            (_, (losses, acc, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            upd, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, upd)
            new_state = state.replace(
                step=state.step + 1, params=params,
                batch_stats=updates.get("batch_stats", state.batch_stats),
                opt_state=opt_state, rng=rng)
            metrics = {"loss": losses["total_loss"], "accuracy": acc,
                       "classification_loss": losses["classification_loss"]}
            if joint:
                metrics["vae_loss"] = losses["vae_loss"]
            return new_state, metrics

        return step

    def _build_eval_step(self):
        model = self.model

        @jax.jit
        def step(state: TrainState, y_st, y_ph, x_ph):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                y_st, y_ph, x_ph, train=False, deterministic_latent=True)
            return out["logits"], out["probabilities"]

        return step

    def _put(self, batch):
        sh = batch_sharding(self.mesh)
        keys = ("fhr_st", "fhr_ph", "fhr_up_ph") + (
            ("fhr",) if self.joint else ())
        out = {k: jax.device_put(np.asarray(batch[k]), sh) for k in keys}
        if "label" in batch:
            out["label"] = jax.device_put(
                np.asarray(batch["label"], np.int32), sh)
        return out

    def train_step(self, state, batch, labels=None):
        b = self._put(batch)
        lab = (b["label"] if labels is None
               else jax.device_put(np.asarray(labels, np.int32),
                                   batch_sharding(self.mesh)))
        # y_raw feeds the joint VAE NLL term; a scalar placeholder keeps the
        # jitted signature stable when the term is off (it is DCE'd).
        y_raw = b["fhr"] if self.joint else jnp.zeros((), jnp.float32)
        return self._train_step(state, b["fhr_st"], b["fhr_ph"],
                                b["fhr_up_ph"], lab, y_raw)

    def predict(self, state, batch):
        b = self._put(batch)
        logits, probs = self._eval_step(state, b["fhr_st"], b["fhr_ph"],
                                        b["fhr_up_ph"])
        return np.asarray(logits), np.asarray(probs)

    def fit(self, state, train_batches: Callable[[int], Iterator],
            label_fn: Callable[[dict], np.ndarray],
            epochs: Optional[int] = None,
            log_fn: Callable[[str], None] = print) -> TrainState:
        for epoch in range(epochs or self.config.epochs):
            t0 = time.time()
            metrics: List[Dict] = []
            for batch in train_batches(epoch):
                state, m = self.train_step(state, batch, label_fn(batch))
                metrics.append(m)
            avg = {k: float(np.mean([m[k] for m in metrics]))
                   for k in metrics[0]} if metrics else {}
            for k, v in avg.items():
                self.history.setdefault(f"train/{k}", []).append(v)
            log_fn(f"classifier epoch {epoch}: loss "
                   f"{avg.get('loss', float('nan')):.4f} acc "
                   f"{avg.get('accuracy', float('nan')):.3f} "
                   f"({time.time() - t0:.1f}s)")
        return state


def train_and_test_folds(make_model: Callable[[], SeqVaeTebClassifier],
                         dataset, folds: Dict, label_fn,
                         config: ClassifierConfig = ClassifierConfig(),
                         batch_size: int = 8, mesh=None,
                         pretrained_vae_params=None,
                         log_fn: Callable[[str], None] = print) -> Dict:
    """k-fold classifier workflow (the reference's intended
    graph_model_refactored_cls.train_and_test_folds, :597): per fold, train
    on the train-GUID subset and collect test-set probabilities/labels.

    folds: output of data.splits.create_cv_splits over GUID groups;
    label_fn(sample) -> int class label. Returns per-fold predictions for
    eval.classification.binary_classification_report.
    """
    from ..data.dataset import CombinedHDF5Dataset  # noqa: F401 (type only)
    results = {}
    for fold_name, split in folds.items():
        train_guids = [g for group in split["train"].values() for g in group]
        test_guids = [g for group in split["test"].values() for g in group]
        train_idx = [i for i in range(len(dataset))
                     if dataset[i]["guid"] in set(train_guids)]
        test_idx = [i for i in range(len(dataset))
                    if dataset[i]["guid"] in set(test_guids)]
        if not train_idx or not test_idx:
            continue
        trainer = ClassifierTrainer(make_model(), config, mesh=mesh)
        state = trainer.init_state(dataset.collate(train_idx[:2]),
                                   pretrained_vae_params=pretrained_vae_params)

        def batches(epoch, idx=tuple(train_idx)):
            order = np.random.default_rng(epoch).permutation(len(idx))
            for start in range(0, len(order) - batch_size + 1, batch_size):
                yield dataset.collate([idx[j] for j in
                                       order[start:start + batch_size]])

        state = trainer.fit(state, batches, label_fn, log_fn=log_fn)

        probs_all, labels_all = [], []
        for start in range(0, len(test_idx), batch_size):
            chunk = test_idx[start:start + batch_size]
            batch = dataset.collate(chunk)
            _, probs = trainer.predict(state, batch)
            probs_all.append(probs)
            labels_all.append(label_fn(batch))
        results[fold_name] = {
            "probabilities": np.concatenate(probs_all),
            "labels": np.concatenate(labels_all),
            "test_indices": np.asarray(test_idx),
        }
        log_fn(f"{fold_name}: {len(train_idx)} train / {len(test_idx)} test")
    return results
