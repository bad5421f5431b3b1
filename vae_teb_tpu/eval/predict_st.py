"""Scattering-domain acceptance tests for the predict-st / SeqVaeTeb models.

Re-design of the reference's seqvae_mse_test and
seqvae_prediction_accuracy_test
(/root/reference/model/predict_st_model/graph_model.py:948-1113,1115-1280):
the domain-accuracy evaluation that justifies the coefficient-predicting
variants. Both share one metric battery — per-(sample, channel) MSE,
energy-normalized MSE, SNR(dB), per-channel VAF, per-sample Gaussian
log-likelihood — computed over the coefficient (scattering+phase) domain.

The reference loops per batch on the host; here each batch's battery is a
single fused device computation and only the (N, C) summaries come back.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import jax.numpy as jnp
import numpy as np


def coefficient_error_stats(sx: jnp.ndarray, mu: jnp.ndarray,
                            var: Optional[jnp.ndarray] = None) -> Dict:
    """Metric battery over coefficient tracks.

    sx/mu/var: (B, C, L) true coefficients, predicted mean, predicted
    variance. Returns per-(sample, channel) mse / energy-normalized mse /
    snr_db, per-channel vaf, per-sample log-likelihood — matching the
    reference's definitions (predict_st graph_model.py:968-994).
    """
    sx = jnp.asarray(sx, jnp.float32)
    mu = jnp.asarray(mu, jnp.float32)
    err2 = (sx - mu) ** 2
    mse = err2.mean(axis=2)                                   # (B, C)
    energy = (sx ** 2).mean(axis=2)                           # (B, C)
    en_mse = mse / (energy + 1e-12)
    snr_db = 10.0 * jnp.log10((energy + 1e-12) / (mse + 1e-12))
    # VAF per channel over the pooled batch (reference calculate_vaf,
    # utils_st/graph_model_utils.py:27): variance of the RESIDUAL, not of
    # its square — var((sx-mu)^2) != var(sx-mu).
    res = sx - mu
    res_var = res.transpose(1, 0, 2).reshape(sx.shape[1], -1).var(axis=1)
    sig_var = sx.transpose(1, 0, 2).reshape(sx.shape[1], -1).var(axis=1)
    vaf = 1.0 - res_var / (sig_var + 1e-12)
    out = {"mse": mse, "energy_normalized_mse": en_mse, "snr_db": snr_db,
           "vaf": vaf}
    if var is not None:
        var = jnp.asarray(var, jnp.float32)
        ll = (-0.5 * (jnp.log(2 * jnp.pi * (var + 1e-12))
                      + err2 / (var + 1e-12))).mean(axis=(1, 2))
        out["log_likelihood"] = ll                            # (B,)
    return out


def _accumulate(acc: Dict[str, list], stats: Dict) -> None:
    for k, v in stats.items():
        acc.setdefault(k, []).append(np.asarray(v))


def _finalize(acc: Dict[str, list], vaf_key: str = "vaf") -> Dict:
    out = {}
    for k, vs in acc.items():
        if k == vaf_key:  # per-channel, averaged over batches
            out[k] = np.mean(np.stack(vs), axis=0)
        else:
            out[k] = np.concatenate(vs, axis=0)
    return out


def _save_artifacts(results: Dict, out_dir: Optional[str], tag: str) -> None:
    if out_dir is None:
        return
    os.makedirs(out_dir, exist_ok=True)
    for k, v in results.items():
        np.save(os.path.join(out_dir, f"{tag}-{k}.npy"), v)
    from .plots import plot_metrics_histograms
    hist = {k: v.mean(axis=-1) if v.ndim > 1 else v
            for k, v in results.items() if k != "vaf"}
    if hist:
        plot_metrics_histograms(
            hist, os.path.join(out_dir, f"{tag}-histograms.png"))


def seqvae_mse_test(model, variables, batches: Iterable,
                    trim: int = 20,
                    out_dir: Optional[str] = None,
                    tag: str = "error_stats") -> Dict:
    """Reconstruction accuracy in the COEFFICIENT domain: the model's
    linear_output (B, S, 87) vs the true [y_st | y_ph], over the interior
    [trim : S-trim] (reference slices [:, :, 20:280] of a 300-step
    sequence, predict_st graph_model.py:965-967).

    Works on SeqVaeTeb (linear_output) — the acceptance test that its
    decoder actually reconstructs the scattering representation it is
    MSE-trained against.
    """
    acc: Dict[str, list] = {}
    for batch in batches:
        y_st = jnp.asarray(batch["fhr_st"])
        y_ph = jnp.asarray(batch["fhr_ph"])
        out = model.apply(variables, y_st, y_ph,
                          jnp.asarray(batch["fhr_up_ph"]),
                          train=False, deterministic=True)
        s = y_st.shape[1]
        if s <= 2 * trim:
            raise ValueError(
                f"sequence length {s} too short for trim {trim}: the "
                f"interior slice [{trim}:{s - trim}] would be empty")
        lo, hi = trim, s - trim
        sx = jnp.concatenate([y_st, y_ph], axis=-1)
        sx = sx.transpose(0, 2, 1)[:, :, lo:hi]                # (B, C, L)
        mu = out["linear_output"].transpose(0, 2, 1)[:, :, lo:hi]
        _accumulate(acc, coefficient_error_stats(sx, mu))
    results = _finalize(acc)
    _save_artifacts(results, out_dir, tag)
    return results


def prediction_accuracy_test(model, variables, batches: Iterable,
                             prediction_idx: int = 30,
                             out_dir: Optional[str] = None,
                             tag: str = "prediction_error_stats") -> Dict:
    """Chained future-coefficient prediction accuracy for
    SeqVaeTebPredictSt: starting at prediction_idx, take the H-step
    predicted window at steps prediction_idx-1 + j*H, concatenate the
    chunks and compare against the true future coefficients — the
    reference's chained predict_next(prediction_index + j*30) evaluation
    (predict_st graph_model.py:1115-1160).

    Returns the same battery per modality, keys prefixed scattering_ /
    phase_.
    """
    acc: Dict[str, list] = {}
    for batch in batches:
        y_st = jnp.asarray(batch["fhr_st"])
        y_ph = jnp.asarray(batch["fhr_ph"])
        out = model.apply(variables, y_st, y_ph,
                          jnp.asarray(batch["fhr_up_ph"]),
                          train=False, deterministic=True)
        h = out["scattering_mu"].shape[2]
        s = y_st.shape[1]
        num = (s - prediction_idx) // h
        if num < 1:
            raise ValueError(
                f"sequence length {s} too short for prediction_idx "
                f"{prediction_idx} with horizon {h}")
        # chunk j comes from the window predicted at step
        # prediction_idx-1 + j*h, covering [t+1 .. t+h]
        t_idx = prediction_idx - 1 + h * np.arange(num)
        span = prediction_idx + num * h - prediction_idx
        for mod, target in (("scattering", y_st), ("phase", y_ph)):
            mu_w = out[f"{mod if mod == 'scattering' else 'phase_harmonic'}_mu"]
            lv_w = out[f"{mod if mod == 'scattering' else 'phase_harmonic'}_logvar"]
            # (B, num, H, C) -> (B, num*H, C) -> (B, C, L)
            mu = mu_w[:, t_idx].reshape(mu_w.shape[0], num * h, -1)
            var = jnp.exp(lv_w[:, t_idx]).reshape(mu_w.shape[0], num * h, -1)
            sx = target[:, prediction_idx:prediction_idx + span]
            stats = coefficient_error_stats(
                sx.transpose(0, 2, 1), mu.transpose(0, 2, 1),
                var.transpose(0, 2, 1))
            _accumulate(acc, {f"{mod}_{k}": v for k, v in stats.items()})
    results = _finalize(acc, vaf_key="__none__")
    # vaf keys are per-channel: average over batches instead of concat
    for k in list(results):
        if k.endswith("_vaf"):
            n_batches = len(acc[k])
            results[k] = results[k].reshape(n_batches, -1).mean(axis=0)
    _save_artifacts(results, out_dir, tag)
    return results
