"""Classifier workflow + binary classification metrics."""

import jax
import numpy as np
import pytest

from vae_teb_tpu.eval.classification import (aggregate_fold_results, auc,
                                             binary_classification_report,
                                             confusion_at_threshold,
                                             latent_class_statistics,
                                             roc_curve, strike_rate_analysis)
from vae_teb_tpu.models import SeqVaeTebClassifier
from vae_teb_tpu.parallel import data_parallel_mesh
from vae_teb_tpu.train import ClassifierConfig, ClassifierTrainer

S = 16


# -- metrics ------------------------------------------------------------------

def test_roc_perfect_classifier():
    labels = np.array([0, 0, 1, 1])
    scores = np.array([0.1, 0.2, 0.8, 0.9])
    fpr, tpr, _ = roc_curve(labels, scores)
    assert auc(fpr, tpr) == 1.0


def test_roc_random_classifier(rng):
    labels = rng.integers(0, 2, 5000)
    scores = rng.random(5000)
    fpr, tpr, _ = roc_curve(labels, scores)
    assert abs(auc(fpr, tpr) - 0.5) < 0.05


def test_confusion_counts():
    labels = np.array([1, 1, 0, 0])
    scores = np.array([0.9, 0.1, 0.8, 0.2])
    c = confusion_at_threshold(labels, scores, 0.5)
    assert c == {"tp": 1, "fp": 1, "tn": 1, "fn": 1}


def test_report_fields():
    labels = np.array([1, 1, 1, 0, 0, 0])
    scores = np.array([0.9, 0.8, 0.4, 0.6, 0.2, 0.1])
    rep = binary_classification_report(labels, scores)
    assert rep["sensitivity"] == 2 / 3
    assert rep["specificity"] == 2 / 3
    assert 0 < rep["auc"] <= 1


def test_strike_rate_monotone(rng):
    labels = rng.integers(0, 2, 2000)
    scores = labels * 0.4 + rng.random(2000) * 0.6  # informative scores
    res = strike_rate_analysis(labels, scores)
    strikes = [r["strike_rate"] for r in res["operating_points"]]
    assert strikes == sorted(strikes)  # higher FPR budget => higher strike
    assert res["auc"] > 0.6


def test_aggregate_folds(rng):
    folds = {}
    for i in range(3):
        labels = rng.integers(0, 2, 64)
        probs = np.stack([1 - labels * 0.7 - 0.1, labels * 0.7 + 0.1], axis=1)
        folds[f"fold_{i}"] = {"probabilities": probs, "labels": labels}
    agg = aggregate_fold_results(folds)
    assert set(agg["per_fold"]) == {"fold_0", "fold_1", "fold_2"}
    assert agg["pooled"]["auc"] > 0.9
    assert agg["mean_auc"] > 0.9


def test_latent_class_statistics(rng):
    z0 = rng.standard_normal((30, 8))
    z1 = rng.standard_normal((30, 8)) + 3.0
    latents = np.concatenate([z0, z1])
    labels = np.array([0] * 30 + [1] * 30)
    stats = latent_class_statistics(latents, labels)
    assert stats["classes"][0]["count"] == 30
    assert stats["separation"] > 1.0  # well-separated classes


# -- trainer -------------------------------------------------------------------

def make_batch(rng, b=8):
    return {
        "fhr_st": rng.standard_normal((b, S, 43)).astype(np.float32),
        "fhr_ph": rng.standard_normal((b, S, 44)).astype(np.float32),
        "fhr_up_ph": rng.standard_normal((b, S, 130)).astype(np.float32),
        "label": rng.integers(0, 2, b).astype(np.int32),
    }


@pytest.mark.parametrize("loss", ["ce", "ldam"])
def test_classifier_trainer_learns_labels(loss, cpu_mesh_devices):
    """Separable synthetic task: the classifier head must fit it."""
    mesh = data_parallel_mesh(devices=cpu_mesh_devices[:2])
    cfg = ClassifierConfig(lr=3e-3, loss=loss, cls_num_list=(32, 32))
    model = SeqVaeTebClassifier(classifier_depth=3, use_attention=False,
                                classifier_filters=8)
    trainer = ClassifierTrainer(model, cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, b=8)
    # make the task separable: class-1 samples get a strong offset pattern
    batch["fhr_up_ph"][batch["label"] == 1, :, :8] += 3.0
    state = trainer.init_state(batch)
    losses = []
    for _ in range(25):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7
    logits, probs = trainer.predict(state, batch)
    assert probs.shape == (8, 2)
    acc = float((probs.argmax(-1) == batch["label"]).mean())
    assert acc >= 0.75


def test_joint_classifier_vae_finetune(cpu_mesh_devices):
    """Joint mode (reference vae_teb_model.py:1440-1468): loss is
    CE + vae_loss_weight*ELBO, and gradients flow into the (unfrozen) VAE."""
    mesh = data_parallel_mesh(devices=cpu_mesh_devices[:2])
    cfg = ClassifierConfig(lr=1e-3, vae_loss_weight=0.1)
    model = SeqVaeTebClassifier(classifier_depth=3, use_attention=False,
                                classifier_filters=8, freeze_vae=False)
    trainer = ClassifierTrainer(model, cfg, mesh=mesh)
    rng = np.random.default_rng(2)
    batch = make_batch(rng, b=4)
    batch["fhr"] = rng.standard_normal((4, S * 16)).astype(np.float32)
    state = trainer.init_state(batch)
    vae_before = jax.device_get(state.params)["vae_model"]
    state, m = trainer.train_step(state, batch)
    # the weighted VAE term is in the loss
    assert "vae_loss" in m and float(m["vae_loss"]) != 0.0
    np.testing.assert_allclose(
        float(m["loss"]),
        float(m["classification_loss"]) + 0.1 * float(m["vae_loss"]),
        rtol=1e-5)
    # and VAE params actually moved (grads flow through the unfrozen VAE)
    vae_after = jax.device_get(state.params)["vae_model"]
    deltas = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                          vae_before, vae_after)
    assert max(jax.tree.leaves(deltas)) > 0.0


def test_joint_mode_rejects_frozen_vae(cpu_mesh_devices):
    mesh = data_parallel_mesh(devices=cpu_mesh_devices[:1])
    model = SeqVaeTebClassifier(classifier_depth=3, freeze_vae=True)
    with pytest.raises(ValueError, match="freeze_vae"):
        ClassifierTrainer(model, ClassifierConfig(vae_loss_weight=0.1),
                          mesh=mesh)


def test_classifier_vae_transfer(cpu_mesh_devices):
    """Pretrained VAE params must land inside the wrapper."""
    import jax.numpy as jnp
    from vae_teb_tpu.models import SeqVaeTeb
    mesh = data_parallel_mesh(devices=cpu_mesh_devices[:1])
    with jax.default_device(cpu_mesh_devices[0]):
        vae = SeqVaeTeb()
        k = jax.random.PRNGKey(0)
        vae_vars = vae.init({"params": k, "sample": k},
                            jnp.ones((1, S, 43)), jnp.ones((1, S, 44)),
                            jnp.ones((1, S, 130)), train=False)
    model = SeqVaeTebClassifier(classifier_depth=3, use_attention=False)
    trainer = ClassifierTrainer(model, ClassifierConfig(), mesh=mesh)
    batch = make_batch(np.random.default_rng(1), b=2)
    state = trainer.init_state(batch,
                               pretrained_vae_params=vae_vars["params"])
    src = np.asarray(jax.tree.leaves(vae_vars["params"]["source_encoder"])[0])
    dst = np.asarray(jax.tree.leaves(
        jax.device_get(state.params)["vae_model"]["source_encoder"])[0])
    np.testing.assert_array_equal(src, dst)
