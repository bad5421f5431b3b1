"""Scientific metrics: VAF / MSE / SNR, mutual information, log-likelihood.

Re-implementations of the reference's metric utilities with the exact same
definitions:
  VAF/MSE/SNR inline math   /root/reference/model/graph_model.py:1619-1645
  calculate_vaf             /root/reference/utils/graph_model_utils.py:27
  Gaussian MI (log-det)     /root/reference/utils/metrics_utils.py:8-82
  histogram MI              /root/reference/utils/metrics_utils.py:100-126
  log-likelihood / latent interpolation  utils/graph_model_utils.py:10-25

The per-sample reconstruction metrics are batched jnp (one fused reduction
for a whole batch on device); MI estimators are host NumPy/sklearn since
they are offline analyses over gathered arrays.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def reconstruction_metrics(original: jnp.ndarray, reconstructed: jnp.ndarray
                           ) -> Dict[str, jnp.ndarray]:
    """Per-sample VAF / MSE / SNR over the last axis. (B, T) -> (B,) each.

    VAF = clip(1 - var(residual)/var(original), 0, 1)
    SNR = 10 log10(mean(x^2) / mean(residual^2)), capped at 100 dB.
    """
    residual = original - reconstructed
    var_res = jnp.var(residual, axis=-1)
    var_orig = jnp.var(original, axis=-1)
    vaf = jnp.where(var_orig > 1e-12,
                    jnp.clip(1.0 - var_res / jnp.maximum(var_orig, 1e-12),
                             0.0, 1.0),
                    0.0)
    mse = jnp.mean(residual ** 2, axis=-1)
    signal_power = jnp.mean(original ** 2, axis=-1)
    noise_power = jnp.mean(residual ** 2, axis=-1)
    snr = jnp.where(noise_power > 1e-12,
                    10.0 * jnp.log10(signal_power
                                     / jnp.maximum(noise_power, 1e-12)),
                    100.0)
    return {"vaf": vaf, "mse": mse, "snr_db": snr}


def calculate_vaf(y: np.ndarray, y_hat: np.ndarray) -> float:
    """Scalar VAF in percent (reference graph_model_utils.py:27-45)."""
    y, y_hat = np.asarray(y), np.asarray(y_hat)
    return float((1.0 - np.var(y - y_hat) / np.var(y)) * 100.0)


def gaussian_log_likelihood(x: np.ndarray, mu: np.ndarray,
                            logvar: np.ndarray) -> float:
    """Mean Gaussian log-likelihood of x under N(mu, e^logvar)
    (reference calculate_log_likelihood, graph_model_utils.py:10-17)."""
    var = np.exp(logvar)
    ll = -0.5 * (np.log(2 * math.pi) + logvar + (x - mu) ** 2 / var)
    return float(np.mean(ll))


def interpolate_latent(z1: np.ndarray, z2: np.ndarray,
                       n_steps: int = 10) -> np.ndarray:
    """Linear interpolation path between two latents
    (reference graph_model_utils.py:19-25)."""
    alphas = np.linspace(0.0, 1.0, n_steps)[:, None, None]
    return (1 - alphas) * z1[None] + alphas * z2[None]


def gaussian_mutual_information(X: np.ndarray, Y: np.ndarray,
                                reduce_dim: bool = False,
                                n_components_X: int = 50,
                                n_components_Y: int = 25) -> float:
    """Gaussian MI estimate via covariance log-determinants, optionally
    after PCA (reference compute_mutual_information, metrics_utils.py:8-82).

    X: (N, T, Cx), Y: (N, T, Cy) -> 0.5 (logdet Sx + logdet Sy - logdet Sxy)
    """
    X, Y = np.asarray(X), np.asarray(Y)
    n = X.shape[0]
    X_flat = X.reshape(n, -1)
    Y_flat = Y.reshape(n, -1)
    if reduce_dim:
        from sklearn.decomposition import PCA
        X_flat = PCA(n_components=n_components_X,
                     svd_solver="full").fit_transform(X_flat)
        Y_flat = PCA(n_components=n_components_Y,
                     svd_solver="full").fit_transform(Y_flat)
    XY = np.hstack([X_flat, Y_flat])
    eps = 1e-10

    def logdet(a):
        cov = np.cov(a, rowvar=False)
        cov = np.atleast_2d(cov) + eps * np.eye(a.shape[1])
        sign, val = np.linalg.slogdet(cov)
        if sign <= 0:
            raise ValueError("covariance matrix is not positive definite")
        return val

    return 0.5 * (logdet(X_flat) + logdet(Y_flat) - logdet(XY))


def discretize_signal(signal: np.ndarray, bins: int = 10) -> np.ndarray:
    """Bin a continuous signal (reference metrics_utils.py:86-98)."""
    edges = np.linspace(np.min(signal), np.max(signal), bins)
    return np.digitize(signal, bins=edges)


def histogram_mutual_information(X: np.ndarray, Z: np.ndarray,
                                 bins: int = 10) -> np.ndarray:
    """Channel-pairwise histogram MI matrix (Cx, Cz)
    (reference calculate_mutual_information, metrics_utils.py:100-126)."""
    from sklearn.metrics import mutual_info_score
    cx, cz = X.shape[2], Z.shape[2]
    x_disc = [discretize_signal(X[:, :, i].ravel(), bins) for i in range(cx)]
    z_disc = [discretize_signal(Z[:, :, j].ravel(), bins) for j in range(cz)]
    mi = np.zeros((cx, cz))
    for i in range(cx):
        for j in range(cz):
            mi[i, j] = mutual_info_score(x_disc[i], z_disc[j])
    return mi
