"""Forecasting decoder variants + the predict-st model family.

Re-designs of the reference's alternative decoders:

  DirectWindowDecoder   per-timestep 480-sample future-window heads fed by
                        parallel MLP + LSTM + causal-conv paths
                        (/root/reference/model/vae_teb_model_prediction_directly.py:780-934)
  ConvWindowDecoder     per-timestep (16, 30) feature maps -> shared conv
                        stack -> 480-sample windows; the reference file has
                        a syntax error and inconsistent widths
                        (vae_teb_model_prediction_raw.py:819-975, :873-874)
                        so this is the *fixed-semantics* realization noted
                        in SURVEY.md §2.5
  PredictStDecoder      future scattering+phase coefficient windows
                        (B, S, H, C) with [t+1..t+H] targets
                        (predict_st_model/vae_teb_model.py:766-917)

plus LDAM class-imbalance margin loss
(predict_st_model/pytorch_lightning_modules.py:92-143).

The reference computes the sliding-window NLL with a Python loop over ~240
timesteps; here the window gather is a static index table and the NLL is
one fused reduction.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import (CausalConvBlock, LSTM, ReflectConvBlock, ResidualMLP,
                     geometric_schedule, linear_upsample)
from .vae_teb import Dtype, SeqVaeTeb, _f32, gaussian_kld


# ---------------------------------------------------------------------------
# vectorized sliding-window losses
# ---------------------------------------------------------------------------

def sliding_window_nll(mu: jnp.ndarray, logvar: jnp.ndarray,
                       target_raw: jnp.ndarray, warmup_period: int = 30,
                       decimation_factor: int = 16) -> jnp.ndarray:
    """Gaussian NLL of per-timestep future windows against the raw signal.

    mu/logvar: (B, S, H); target_raw: (B, L). Step t predicts raw samples
    [t*dec, t*dec + H); steps before warmup or overflowing L are skipped —
    identical to the reference loop (prediction_directly :898-934), done as
    one static gather + fused mean.
    """
    b, s, h = mu.shape
    length = target_raw.shape[1]
    t_idx = np.arange(s)
    valid = (t_idx >= warmup_period) & (t_idx * decimation_factor + h <= length)
    tv = t_idx[valid]
    if tv.size == 0:
        return jnp.float32(0.0)
    gather = tv[:, None] * decimation_factor + np.arange(h)[None, :]  # (T, H)
    windows = _f32(target_raw)[:, jnp.asarray(gather)]  # (B, T, H)
    mu_v = _f32(mu)[:, jnp.asarray(tv), :]
    lv_v = _f32(logvar)[:, jnp.asarray(tv), :]
    nll = 0.5 * (lv_v + (windows - mu_v) ** 2 / jnp.exp(lv_v))
    # reference averages per-t means over valid t == global mean here
    return nll.mean()


def future_window_targets(target: jnp.ndarray, horizon: int) -> jnp.ndarray:
    """(B, S, C) -> (B, S-H, H, C) windows [t+1 .. t+H]
    (reference create_target_windows, predict_st vae_teb_model.py:884-897)."""
    b, s, c = target.shape
    t = np.arange(s - horizon)[:, None] + np.arange(1, horizon + 1)[None, :]
    return target[:, jnp.asarray(t), :]  # (B, S-H, H, C)


def predict_st_loss(predictions: Dict[str, jnp.ndarray],
                    target_scattering: jnp.ndarray,
                    target_phase: jnp.ndarray,
                    warmup_period: int,
                    compute_scattering_loss: bool = True,
                    compute_phase_loss: bool = True) -> Dict[str, jnp.ndarray]:
    """Gaussian NLL over future coefficient windows for both modalities
    (reference predict_st compute_loss, :843-917)."""
    s = target_scattering.shape[1]
    horizon = predictions["scattering_mu"].shape[2]
    start, end = warmup_period, s - horizon
    zero = jnp.float32(0.0)
    if start >= end:
        return {"total_loss": zero, "scattering_loss": zero,
                "phase_loss": zero}

    def _nll(mu, logvar, windows):
        mu, logvar, windows = _f32(mu), _f32(logvar), _f32(windows)
        nll = 0.5 * (logvar + (windows - mu) ** 2 / jnp.exp(logvar))
        return nll.mean()

    scattering_loss = zero
    phase_loss = zero
    if compute_scattering_loss:
        win = future_window_targets(target_scattering, horizon)[:, start:end]
        scattering_loss = _nll(predictions["scattering_mu"][:, start:end],
                               predictions["scattering_logvar"][:, start:end],
                               win)
    if compute_phase_loss:
        win = future_window_targets(target_phase, horizon)[:, start:end]
        phase_loss = _nll(predictions["phase_harmonic_mu"][:, start:end],
                          predictions["phase_harmonic_logvar"][:, start:end],
                          win)
    return {"total_loss": scattering_loss + phase_loss,
            "scattering_loss": scattering_loss, "phase_loss": phase_loss}


def ldam_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              cls_num_list: Sequence[int], max_m: float = 0.5,
              s: float = 30.0) -> jnp.ndarray:
    """Label-Distribution-Aware Margin loss: subtract a per-class margin
    delta_j proportional to n_j^{-1/4} from the true-class logit, scale, CE
    (reference LDAMLoss, predict_st pytorch_lightning_modules.py:92-143)."""
    counts = np.asarray(cls_num_list, dtype=np.float64)
    margins = 1.0 / np.sqrt(np.sqrt(counts))
    margins = margins * (max_m / margins.max())
    m = jnp.asarray(margins, jnp.float32)[labels]          # (N,)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    logits_m = logits - onehot * m[:, None]
    logp = jax.nn.log_softmax(s * logits_m, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------

class DirectWindowDecoder(nn.Module):
    """z -> per-timestep (mu, logvar) over a future raw window: three
    parallel paths (MLP / 3-layer LSTM(256) / six causal convs k=3..29)
    summed, then window heads (reference prediction_directly :780-896)."""
    latent_dim: int = 32
    prediction_horizon: int = 480
    hidden: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        dt = self.dtype
        x_linear = ResidualMLP(geometric_schedule(self.latent_dim,
                                                  self.hidden, 4),
                               final_activation=True, activation=nn.relu,
                               dtype=dt, name="linear")(z)
        x_lstm, _ = LSTM(self.hidden, 3, dtype=dt, name="lstm")(z)
        x_conv = z
        for i, k in enumerate((3, 5, 7, 11, 19, 29)):
            x_conv = CausalConvBlock(self.hidden, k, dtype=dt,
                                     name=f"conv_{i}")(x_conv, train)
        x = x_linear + x_lstm + x_conv
        x = ResidualMLP(geometric_schedule(self.hidden, 360, 4),
                        final_activation=True, activation=nn.relu,
                        dtype=dt, name="final_processor")(x)
        mu = ResidualMLP(geometric_schedule(360, self.prediction_horizon, 5),
                         final_activation=False, use_skip_connection=False,
                         activation=nn.relu, dtype=dt, name="output_mu")(x)
        logvar = ResidualMLP(geometric_schedule(360, self.prediction_horizon, 5),
                             final_activation=False, use_skip_connection=False,
                             activation=nn.relu, dtype=dt,
                             name="output_logvar")(x)
        return mu, jnp.clip(logvar, -8.0, 8.0)


class ConvWindowDecoder(nn.Module):
    """z -> per-timestep (16, 30) feature maps -> shared upsampling conv
    stack (30 -> 480) -> window heads. Fixed-semantics realization of the
    reference's broken prediction_raw decoder (:819-931)."""
    latent_dim: int = 32
    prediction_horizon: int = 480
    feature_channels: int = 16
    feature_len: int = 30
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        b, s, _ = z.shape
        dt = self.dtype
        fdim = self.feature_channels * self.feature_len
        x = ResidualMLP(geometric_schedule(self.latent_dim, 50, 5),
                        final_activation=True, activation=nn.relu,
                        dtype=dt, name="linear_0")(z)
        x = ResidualMLP(geometric_schedule(50, fdim, 5),
                        final_activation=True, activation=nn.relu,
                        dtype=dt, name="linear_1")(x)
        # shared conv stack over the per-timestep feature maps
        x = x.reshape(b * s, self.feature_len, self.feature_channels)
        spec = [(32, 11, False), (32, 9, True), (24, 7, True),
                (16, 5, True), (8, 3, True), (1, 3, False)]
        for i, (feat, k, up) in enumerate(spec):
            x = ReflectConvBlock(feat, k, up_sampling=up, dtype=dt,
                                 name=f"conv_{i}")(x, train)
        x = x.reshape(b, s, self.feature_len * 16)
        x = ResidualMLP((self.prediction_horizon, self.prediction_horizon),
                        final_activation=False, use_skip_connection=False,
                        activation=nn.relu, dtype=dt, name="pre_output")(x)
        mu = ResidualMLP((self.prediction_horizon,) * 3,
                         final_activation=False, use_skip_connection=False,
                         activation=nn.relu, dtype=dt, name="output_mu")(x)
        logvar = ResidualMLP((self.prediction_horizon,) * 3,
                             final_activation=False, use_skip_connection=False,
                             activation=nn.relu, dtype=dt,
                             name="output_logvar")(x)
        return mu, jnp.clip(logvar, -8.0, 8.0)


class PredictStDecoder(nn.Module):
    """z -> future scattering + phase coefficient windows (B, S, H, C_mod):
    dual path (MLP + dilated causal TCN) -> LSTM -> per-modality mu/logvar
    heads (clean-width re-design of predict_st vae_teb_model.py:640-830)."""
    latent_dim: int = 32
    prediction_horizon: int = 30
    scattering_channels: int = 43
    phase_channels: int = 44
    hidden: int = 256
    lstm_layers: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        b, s, _ = z.shape
        dt = self.dtype
        lin = ResidualMLP(geometric_schedule(self.latent_dim, self.hidden, 4),
                          final_activation=True, activation=nn.gelu,
                          dtype=dt, name="linear_path")(z)
        conv = z
        for i, (k, d) in enumerate(((3, 1), (3, 2), (3, 4), (3, 8))):
            conv = CausalConvBlock(self.hidden, k, dilation=d, dtype=dt,
                                   name=f"tcn_{i}")(conv, train)
        x = ResidualMLP((self.hidden, self.hidden), final_activation=True,
                        activation=nn.gelu, dtype=dt, name="path_fusion")(
            jnp.concatenate([lin, conv], axis=-1))
        x, _ = LSTM(self.hidden, self.lstm_layers, dtype=dt, name="lstm")(x)
        x = ResidualMLP((self.hidden, self.hidden), final_activation=True,
                        activation=nn.gelu, dtype=dt, name="post_lstm")(x)

        h = self.prediction_horizon
        out = {}
        for mod, c in (("scattering", self.scattering_channels),
                       ("phase_harmonic", self.phase_channels)):
            mu = nn.Dense(h * c, dtype=dt, name=f"{mod}_mu_head")(x)
            lv = nn.Dense(h * c, dtype=dt, name=f"{mod}_logvar_head")(x)
            out[f"{mod}_mu"] = mu.reshape(b, s, h, c)
            out[f"{mod}_logvar"] = jnp.clip(lv.reshape(b, s, h, c),
                                            -10.0, 10.0)
        return out


# ---------------------------------------------------------------------------
# full variant models (encoders shared with SeqVaeTeb)
# ---------------------------------------------------------------------------

class SeqVaeTebForecast(SeqVaeTeb):
    """SeqVaeTeb with the decoder swapped for a future-window forecaster.

    decoder_type: 'direct' (parallel-path heads) or 'conv_window' (shared
    per-timestep conv stack). Loss = sliding-window NLL + beta * KL.
    """
    decoder_type: str = "direct"
    prediction_horizon: int = 480

    def setup(self):
        super().setup()
        if self.decoder_type == "direct":
            self.window_decoder = DirectWindowDecoder(
                latent_dim=self.latent_dim_z,
                prediction_horizon=self.prediction_horizon,
                dtype=self.dtype)
        elif self.decoder_type == "conv_window":
            self.window_decoder = ConvWindowDecoder(
                latent_dim=self.latent_dim_z,
                prediction_horizon=self.prediction_horizon,
                dtype=self.dtype)
        else:
            raise ValueError(f"unknown decoder_type {self.decoder_type}")

    def __call__(self, y_st, y_ph, x_ph, train: bool = True,
                 deterministic: bool = False):
        enc = self.encode(y_st, y_ph, x_ph, train)
        if deterministic:
            z = enc["mu_post"]
        else:
            eps = jax.random.normal(self.make_rng("sample"),
                                    enc["mu_post"].shape,
                                    enc["mu_post"].dtype)
            z = enc["mu_post"] + eps * jnp.exp(0.5 * enc["logvar_post"])
        mu_w, logvar_w = self.window_decoder(z, train)
        return {"z": z, "window_mu": mu_w, "window_logvar": logvar_w, **enc}

    @staticmethod
    def compute_loss(outputs: Dict, y_raw, beta: float = 1.0,
                     warmup_period: int = 30,
                     decimation_factor: int = 16) -> Dict:
        nll = sliding_window_nll(outputs["window_mu"],
                                 outputs["window_logvar"], y_raw,
                                 warmup_period, decimation_factor)
        kld = gaussian_kld(outputs["mu_prior"], outputs["logvar_prior"],
                           outputs["mu_post"], outputs["logvar_post"])
        return {"nll_loss": nll, "kld_loss": kld,
                "reconstruction_loss": nll,
                "total_loss": nll + beta * kld}


class SeqVaeTebPredictSt(SeqVaeTeb):
    """SeqVaeTeb predicting future scattering/phase coefficients instead of
    the raw signal (the reference's predict_st_model family)."""
    prediction_horizon: int = 30

    def setup(self):
        super().setup()
        self.st_decoder = PredictStDecoder(
            latent_dim=self.latent_dim_z,
            prediction_horizon=self.prediction_horizon,
            scattering_channels=self.n_scattering,
            phase_channels=self.n_phase, dtype=self.dtype)

    def __call__(self, y_st, y_ph, x_ph, train: bool = True,
                 deterministic: bool = False):
        enc = self.encode(y_st, y_ph, x_ph, train)
        if deterministic:
            z = enc["mu_post"]
        else:
            eps = jax.random.normal(self.make_rng("sample"),
                                    enc["mu_post"].shape,
                                    enc["mu_post"].dtype)
            z = enc["mu_post"] + eps * jnp.exp(0.5 * enc["logvar_post"])
        preds = self.st_decoder(z, train)
        return {"z": z, **preds, **enc}

    @staticmethod
    def compute_loss(outputs: Dict, y_st, y_ph, beta: float = 1.0,
                     warmup_period: int = 30) -> Dict:
        losses = predict_st_loss(outputs, y_st, y_ph, warmup_period)
        kld = gaussian_kld(outputs["mu_prior"], outputs["logvar_prior"],
                           outputs["mu_post"], outputs["logvar_post"])
        total = losses["total_loss"] + beta * kld
        return {**losses, "kld_loss": kld, "total_loss": total,
                "reconstruction_loss": losses["total_loss"]}
