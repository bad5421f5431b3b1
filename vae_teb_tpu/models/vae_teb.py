"""SeqVaeTeb: sequence VAE with Target-Encoder-Bank conditioning.

Flax re-design of the reference model family
(/root/reference/model/vae_teb_model.py:406-1246), same information flow:

  SourceEncoder   x_ph (B,S,130) -> mu_x (B,S,32)            [causal]
  TargetEncoder   y_st (B,S,43), y_ph (B,S,44)
                  -> mu_y (B,S,32), logvar_full (B,S,64)
                  logvar_full splits into prior logvar + conditional feature
  ConditionalEncoder  (mu_x, c_logvar) -> q(z|x,y); mu_post += mu_y
  Decoder         z (B,S,32) -> linear_output (B,S,87),
                  raw mu/logvar (B, 4800)

Losses: MSE(linear_output, [y_st|y_ph]) + Gaussian NLL(raw) + beta * KL(q‖p)
(reference :932-979, :1133-1192). Transfer entropy = KL(q‖p) per step/dim
(:1194-1226).

All loss/divergence math lives in pure functions so the training step, the
evaluation suite, and the classifier reuse one implementation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import (CausalConvBlock, LSTM, ReflectConvBlock, ResidualMLP,
                     geometric_schedule)

Dtype = Any


def _schedule_unroll(schedule: str) -> int:
    """Measured-optimal scan unroll per LSTM schedule (v5e, batch 32, S=300,
    two 4-layer streams, fwd+bwd, benchmarks/profile_wavefront.py): wavefront
    4.06 ms @ 16 -> 3.55 @ 8; stacked keeps its own sweep optimum of 16."""
    return 8 if schedule == "wavefront" else 16


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    """Loss math always runs in float32: under a bf16 compute policy the
    activations arrive half-precision, but exp(logvar) / squared errors
    amplify bf16's 8-bit mantissa into visible loss noise (the reference's
    16-mixed autocast likewise keeps reductions in fp32)."""
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# pure loss / divergence functions
# ---------------------------------------------------------------------------

def gaussian_kld(mu_prior, logvar_prior, mu_post, logvar_post,
                 reduce_mean: bool = True):
    """KL( N(mu_post, e^{logvar_post}) ‖ N(mu_prior, e^{logvar_prior}) ),
    elementwise analytic form (reference :1052-1082). reduce_mean sums the
    latent dim then means over batch/time."""
    mu_prior, logvar_prior = _f32(mu_prior), _f32(logvar_prior)
    mu_post, logvar_post = _f32(mu_post), _f32(logvar_post)
    kld = 0.5 * (logvar_prior - logvar_post - 1.0
                 + (jnp.exp(logvar_post) + (mu_post - mu_prior) ** 2)
                 / jnp.exp(logvar_prior))
    if reduce_mean:
        return kld.sum(axis=-1).mean()
    return kld


def gaussian_nll(mu, logvar, target):
    """0.5 * (logvar + (target - mu)^2 / var), mean-reduced (reference
    :969-973)."""
    mu, logvar = _f32(mu), _f32(logvar)
    diff = _f32(target) - mu
    return (0.5 * (logvar + diff * diff / jnp.exp(logvar))).mean()


def decoder_loss(linear_output, raw_mu, raw_logvar, y_st, y_ph, y_raw):
    """MSE on the coefficient reconstruction + NLL on the raw signal
    (reference Decoder.compute_loss, :932-979)."""
    stacked_target = jnp.concatenate([_f32(y_st), _f32(y_ph)], axis=-1)
    mse = jnp.mean((_f32(linear_output) - stacked_target) ** 2)
    nll = gaussian_nll(raw_mu, raw_logvar, y_raw)
    return {"mse_loss": mse, "nll_loss": nll,
            "total_decoder_loss": mse + nll}


def stitch_predictions(x: jnp.ndarray, stride: int = 16,
                       new_len: int = 4800) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overlap-average per-step windows onto the raw-signal grid.

    x: (B, N, C) per-step length-C predictions placed at offsets i*stride.
    Returns (stacked (B, K, new_len) with NaN where nothing lands, nan-mean
    (B, new_len)). Replaces the reference's Python placement loop
    (:1228-1246) with a static gather: output position j receives
    contributions from steps i = j//stride - k, k in [0, C/stride).
    """
    b, n, c = x.shape
    k_max = (c + stride - 1) // stride
    j = np.arange(new_len)
    ks = np.arange(k_max)[:, None]
    i_idx = j[None, :] // stride - ks                      # (K, new_len)
    c_idx = j[None, :] % stride + stride * ks
    valid = (i_idx >= 0) & (i_idx < n) & (c_idx < c)
    i_safe = np.clip(i_idx, 0, n - 1)
    c_safe = np.clip(c_idx, 0, c - 1)
    vals = x[:, jnp.asarray(i_safe), jnp.asarray(c_safe)]  # (B, K, new_len)
    mask = jnp.asarray(valid)[None]
    stacked = jnp.where(mask, vals, jnp.nan)
    denom = jnp.maximum(mask.sum(axis=1), 1)
    mean = jnp.where(mask, vals, 0.0).sum(axis=1) / denom
    return stacked, mean


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class TargetEncoder(nn.Module):
    """y_st + y_ph -> (mu, logvar_full): per-modality MLP + causal convs,
    cross-modal fusion, 4-layer LSTM, variational heads
    (reference :406-586). Split into pre_lstm / post_lstm around the LSTM so
    SeqVaeTeb.encode can fuse this LSTM with the source encoder's into one
    scan (see blocks.run_lstm_streams)."""
    latent_dim: int = 32
    lstm_hidden_dim: int = 64
    lstm_num_layers: int = 4
    n_scattering: int = 43
    n_phase: int = 44
    lstm_schedule: str = "wavefront"
    dtype: Optional[Dtype] = None

    def setup(self):
        dt = self.dtype
        self.mlp_scattering = ResidualMLP(
            geometric_schedule(self.n_scattering, 16, 4),
            final_activation=False, activation=nn.gelu, dtype=dt)
        self.mlp_phase = ResidualMLP(
            geometric_schedule(self.n_phase, 16, 4),
            final_activation=False, activation=nn.relu, dtype=dt)
        self.conv_scattering_0 = CausalConvBlock(16, 3, dtype=dt)
        self.conv_scattering_1 = CausalConvBlock(16, 5, dtype=dt)
        self.conv_scattering_2 = CausalConvBlock(16, 7, dtype=dt)
        self.scatter_fused_norm = nn.LayerNorm(dtype=dt)
        self.conv_phase_0 = CausalConvBlock(16, 3, dtype=dt)
        self.conv_phase_1 = CausalConvBlock(16, 5, dtype=dt)
        self.conv_phase_2 = CausalConvBlock(16, 7, dtype=dt)
        self.phase_fused_norm = nn.LayerNorm(dtype=dt)
        self.cross_modal_fusion = ResidualMLP(
            geometric_schedule(32, 20, 5), final_activation=False,
            activation=nn.relu, dtype=dt)
        self.lstm = LSTM(self.lstm_hidden_dim, self.lstm_num_layers,
                         unroll=_schedule_unroll(self.lstm_schedule),
                         schedule=self.lstm_schedule, dtype=dt)
        self.lstm_norm = nn.LayerNorm(dtype=dt)
        self.pre_output = ResidualMLP(
            geometric_schedule(self.lstm_hidden_dim, 32, 5),
            final_activation=True, activation=nn.relu, dtype=dt)
        self.mu_layer = ResidualMLP(
            geometric_schedule(32, self.latent_dim, 32),
            final_activation=False, activation=nn.relu, dtype=dt)
        self.logvar_layer = ResidualMLP(
            geometric_schedule(32, 2 * self.latent_dim, 4),
            final_activation=False, activation=nn.relu, dtype=dt)

    def pre_lstm(self, y_st, y_ph, train: bool = True):
        sc = self.mlp_scattering(y_st)
        ph = self.mlp_phase(y_ph)
        for conv in (self.conv_scattering_0, self.conv_scattering_1,
                     self.conv_scattering_2):
            sc = conv(sc, train)
        sc = self.scatter_fused_norm(sc)
        for conv in (self.conv_phase_0, self.conv_phase_1,
                     self.conv_phase_2):
            ph = conv(ph, train)
        ph = self.phase_fused_norm(ph)
        x = jnp.concatenate([sc, ph], axis=-1)
        return self.cross_modal_fusion(x)

    def post_lstm(self, x):
        x = self.lstm_norm(x)
        x = self.pre_output(x)
        mu = self.mu_layer(x)
        logvar = self.logvar_layer(x)
        return mu, jnp.clip(logvar, -10.0, 10.0)

    def __call__(self, y_st, y_ph, train: bool = True):
        x = self.pre_lstm(y_st, y_ph, train)
        x, _ = self.lstm(x)
        return self.post_lstm(x)


SOURCE_CONV_KERNELS = (3, 5, 7)
SOURCE_CONV_WIDTH = 32


def source_stream_init_state(batch_size: int,
                             lstm_num_layers: int = 4,
                             lstm_hidden_dim: int = 64,
                             dtype: Optional[Dtype] = None) -> Dict:
    """Zero-initialized carried state for SourceEncoder.stream: one causal
    tail per conv layer (the zero left pad of the full-sequence call) plus
    the stacked LSTM (h, c). A plain function so callers can build the
    state without a bound module."""
    dt = dtype or jnp.float32
    tails = tuple(jnp.zeros((batch_size, k - 1, SOURCE_CONV_WIDTH), dt)
                  for k in SOURCE_CONV_KERNELS)
    h = jnp.zeros((lstm_num_layers, batch_size, lstm_hidden_dim), dt)
    return {"conv_tails": tails, "h": h, "c": jnp.zeros_like(h)}


class SourceEncoder(nn.Module):
    """x_ph -> mu_x: MLP channel reduction, causal convs, causal LSTM
    (reference :589-740). Everything is unidirectional: the source encoding
    at step t sees only x[<=t] — which is what makes `stream` possible."""
    input_channels: int = 130
    latent_dim: int = 32
    lstm_hidden_dim: int = 64
    lstm_num_layers: int = 4
    lstm_schedule: str = "wavefront"
    dtype: Optional[Dtype] = None

    def setup(self):
        dt = self.dtype
        self.mlp = ResidualMLP(
            geometric_schedule(self.input_channels, SOURCE_CONV_WIDTH, 5),
            final_activation=False, activation=nn.relu, dtype=dt)
        self.conv_0 = CausalConvBlock(SOURCE_CONV_WIDTH,
                                      SOURCE_CONV_KERNELS[0], dtype=dt)
        self.conv_1 = CausalConvBlock(SOURCE_CONV_WIDTH,
                                      SOURCE_CONV_KERNELS[1], dtype=dt)
        self.conv_2 = CausalConvBlock(SOURCE_CONV_WIDTH,
                                      SOURCE_CONV_KERNELS[2], dtype=dt)
        self.fused_norm = nn.LayerNorm(dtype=dt)
        self.lstm = LSTM(self.lstm_hidden_dim, self.lstm_num_layers,
                         unroll=_schedule_unroll(self.lstm_schedule),
                         schedule=self.lstm_schedule, dtype=dt)
        self.lstm_norm = nn.LayerNorm(dtype=dt)
        self.pre_output = ResidualMLP(
            geometric_schedule(self.lstm_hidden_dim, 32, 4),
            final_activation=True, activation=nn.relu, dtype=dt)
        self.mu_layer = ResidualMLP(
            geometric_schedule(32, self.latent_dim, 4),
            final_activation=False, activation=nn.relu, dtype=dt)

    def pre_lstm(self, x, train: bool = True):
        x = self.mlp(x)
        for conv in (self.conv_0, self.conv_1, self.conv_2):
            x = conv(x, train)
        return self.fused_norm(x)

    def _head(self, x):
        x = self.lstm_norm(x)
        x = self.pre_output(x)
        return self.mu_layer(x)

    def __call__(self, x, train: bool = True):
        x = self.pre_lstm(x, train)
        x, _ = self.lstm(x)
        return self._head(x)

    def stream(self, x, state: Dict) -> Tuple[jnp.ndarray, Dict]:
        """Incremental causal encoding for serving: process one chunk
        (B, S_chunk, C) given the carried state and return
        (mu_x_chunk, new_state). Chaining chunks reproduces __call__'s
        full-sequence output exactly (eval mode) — the incremental-inference
        entry the reference only sketches (SourceEncoder.get_sequence_encoding,
        /root/reference/model/vae_teb_model.py:723-740, which recomputes the
        full forward per call).

        state: from source_stream_init_state(batch_size, ...). BatchNorm
        runs on running averages (train=False); streaming during training
        is not meaningful."""
        y = self.mlp(x)
        tails = []
        for conv, tail in zip((self.conv_0, self.conv_1, self.conv_2),
                              state["conv_tails"]):
            full = jnp.concatenate([tail.astype(y.dtype), y], axis=1)
            tails.append(full[:, -tail.shape[1]:, :])
            y = conv(y, train=False, carry=tail)
        y = self.fused_norm(y)
        y, (h, c) = self.lstm(y, initial_state=(state["h"], state["c"]))
        mu = self._head(y)
        return mu, {"conv_tails": tuple(tails), "h": h, "c": c}

    def get_sequence_encoding(self, x, timestep: int):
        """Causal encoding up to `timestep` inclusive (reference API,
        vae_teb_model.py:723-740): full forward, sliced. For true
        incremental serving use `stream`."""
        timestep = min(timestep, x.shape[1] - 1)
        mu = self(x, train=False)
        return mu[:, : timestep + 1, :]


class ConditionalEncoder(nn.Module):
    """q(z | x, y): concat(mu_x, c_logvar) -> ResidualMLP chain -> mu/logvar
    (reference :743-820). The geometric schedule 64->32 over 8 hidden layers
    is split 5 (trunk) + 3 (each head), as in the reference (:766-789)."""
    dim_hx: int = 32
    dim_hy: int = 32
    dim_z: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h_x, h_y):
        dims = geometric_schedule(self.dim_hx + self.dim_hy, self.dim_z, 8)
        h = jnp.concatenate([h_x, h_y], axis=-1)
        h = ResidualMLP(dims[0:5], final_activation=True, activation=nn.relu,
                        dtype=self.dtype, name="mlp")(h)
        mu = ResidualMLP(dims[5:], final_activation=False,
                         use_skip_connection=False, activation=nn.relu,
                         dtype=self.dtype, name="fc_mu")(h)
        logvar = ResidualMLP(dims[5:], final_activation=False,
                             use_skip_connection=False, activation=nn.relu,
                             dtype=self.dtype, name="fc_logvar")(h)
        return mu, logvar


class Decoder(nn.Module):
    """z (B,S,32) -> (linear_output (B,S,87), raw mu/logvar (B, S*16)):
    MLP trunk, 8 reflect-conv blocks with 4 2x-upsample stages
    (S -> 16S), two dense reconstruction heads (reference :823-929)."""
    latent_dim: int = 32
    coeff_channels: int = 87  # 43 scattering + 44 phase
    upsample_factor: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        y = ResidualMLP(geometric_schedule(self.latent_dim, 50, 5),
                        final_activation=True, activation=nn.relu,
                        dtype=self.dtype, name="linear_0")(z)
        linear_output = ResidualMLP(
            geometric_schedule(50, self.coeff_channels, 5),
            final_activation=True, activation=nn.relu, dtype=self.dtype,
            name="linear_1")(y)

        # Base spec has 4 2x-upsample stages (factor 16, the production
        # decimation). For other power-of-two factors the first log2(f)
        # upsample slots are kept and the rest run at constant length.
        n_up = int(np.log2(self.upsample_factor))
        if 2 ** n_up != self.upsample_factor or n_up > 4:
            raise ValueError("upsample_factor must be a power of two <= 16")
        up_slots = iter([True] * n_up + [False] * (4 - n_up))
        conv_spec = [  # (features, kernel, upsample-slot?)
            (77, 11, False), (66, 9, True), (55, 7, True), (44, 5, False),
            (33, 5, True), (22, 3, True), (11, 3, False), (1, 3, False),
        ]
        x = linear_output
        for i, (feat, k, is_slot) in enumerate(conv_spec):
            up = next(up_slots) if is_slot else False
            x = ReflectConvBlock(feat, k, up_sampling=up, dtype=self.dtype,
                                 name=f"conv_{i}")(x, train)
        raw_len = z.shape[1] * self.upsample_factor
        x = x.reshape(x.shape[0], raw_len)
        mu = ResidualMLP((raw_len, raw_len), final_activation=False,
                         use_skip_connection=False, activation=nn.relu,
                         dtype=self.dtype, name="output_mu")(x)
        logvar = ResidualMLP((raw_len, raw_len), final_activation=False,
                             use_skip_connection=False, activation=nn.relu,
                             dtype=self.dtype, name="output_logvar")(x)
        return linear_output, mu, logvar


class SeqVaeTeb(nn.Module):
    """Full TEB sequence VAE (reference :982-1246).

    apply() needs rngs={"sample": key} when sample_posterior=True (training
    and stochastic eval); deterministic=True uses the posterior mean.

    dtype sets the COMPUTE precision policy (the reference trains 16-mixed,
    /root/reference/model/graph_model.py:510,670): params stay float32
    (flax param_dtype default), matmuls/convs/activations run in `dtype`
    (use jnp.bfloat16 on TPU — MXU-native, no GradScaler needed), and all
    loss math is cast back to float32 (see _f32).
    """
    latent_dim_source: int = 32
    latent_dim_target: int = 32
    latent_dim_z: int = 32
    input_channels: int = 130
    n_scattering: int = 43
    n_phase: int = 44
    decimation_factor: int = 16
    warmup_period: int = 30
    # "wavefront" runs both encoder LSTM stacks as ONE block-diagonal matmul
    # per scan step (blocks._wavefront_core): fwd+bwd 6.06 -> 3.55 ms on v5e
    # at the production shape. "stacked" is the layer-sequential fallback.
    lstm_schedule: str = "wavefront"
    # LSTM stack size for BOTH encoders (reference hard-codes 64x4,
    # vae_teb_model.py:457,633). Exposed so cheap configs (sharding dry
    # runs, CI) can compile a structurally identical but smaller program.
    lstm_hidden_dim: int = 64
    lstm_num_layers: int = 4
    dtype: Optional[Dtype] = None

    def setup(self):
        self.source_encoder = SourceEncoder(
            input_channels=self.input_channels,
            latent_dim=self.latent_dim_source,
            lstm_hidden_dim=self.lstm_hidden_dim,
            lstm_num_layers=self.lstm_num_layers,
            lstm_schedule=self.lstm_schedule, dtype=self.dtype)
        self.target_encoder = TargetEncoder(
            latent_dim=self.latent_dim_target,
            n_scattering=self.n_scattering, n_phase=self.n_phase,
            lstm_hidden_dim=self.lstm_hidden_dim,
            lstm_num_layers=self.lstm_num_layers,
            lstm_schedule=self.lstm_schedule, dtype=self.dtype)
        self.conditional_encoder = ConditionalEncoder(
            dim_hx=self.latent_dim_source, dim_hy=self.latent_dim_target,
            dim_z=self.latent_dim_z, dtype=self.dtype)
        self.decoder = Decoder(latent_dim=self.latent_dim_z,
                               coeff_channels=self.n_scattering + self.n_phase,
                               upsample_factor=self.decimation_factor,
                               dtype=self.dtype)

    def encode(self, y_st, y_ph, x_ph, train: bool = True):
        """All three encoders; returns the distribution parameters.

        The source and target LSTMs are independent until the conditional
        encoder, but XLA executes independent lax.scans SEQUENTIALLY (one
        TPU program, no streams) — so both are prepared and run in ONE
        fused scan (blocks.run_lstm_streams), halving the sequential
        seq-300 iteration count in forward and backward."""
        from .blocks import run_lstm_streams
        se, te = self.source_encoder, self.target_encoder
        se_feat = se.pre_lstm(x_ph, train)
        te_feat = te.pre_lstm(y_st, y_ph, train)
        se_stream = se.lstm(se_feat, prepare=True)
        te_stream = te.lstm(te_feat, prepare=True)
        (se_out, _), (te_out, _) = run_lstm_streams(
            [se_stream, te_stream], unroll=se.lstm.unroll,
            schedule=se.lstm.schedule)
        mu_x = se._head(se_out)
        mu_y, logvar_full = te.post_lstm(te_out)
        logvar_prior, c_logvar = jnp.split(logvar_full, 2, axis=-1)
        mu_post, logvar_post = self.conditional_encoder(mu_x, c_logvar)
        mu_post = mu_post + mu_y  # residual posterior mean (reference :1115)
        return {"mu_x": mu_x, "mu_prior": mu_y, "logvar_prior": logvar_prior,
                "mu_post": mu_post, "logvar_post": logvar_post}

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
        linear_output, mu_pr, logvar_pr = self.decoder(z, train)
        return {"z": z, "linear_output": linear_output,
                "mu_pr": mu_pr, "logvar_pr": logvar_pr, **enc}

    @staticmethod
    def compute_loss(outputs: Dict, y_st, y_ph, y_raw,
                     beta: float = 1.0, compute_kld_loss: bool = True) -> Dict:
        losses = decoder_loss(outputs["linear_output"], outputs["mu_pr"],
                              outputs["logvar_pr"], y_st, y_ph, y_raw)
        kld = (gaussian_kld(outputs["mu_prior"], outputs["logvar_prior"],
                            outputs["mu_post"], outputs["logvar_post"])
               if compute_kld_loss else jnp.float32(0.0))
        total = losses["total_decoder_loss"] + beta * kld
        return {"reconstruction_loss": losses["total_decoder_loss"],
                "mse_loss": losses["mse_loss"],
                "nll_loss": losses["nll_loss"],
                "kld_loss": kld, "total_loss": total}

    def decode(self, z, train: bool = False):
        """Decoder-only entry (latent interpolation / animation analyses):
        z (B, S, latent) -> (linear_output, raw mu, raw logvar)."""
        return self.decoder(z, train)

    def encode_source_stream(self, x_chunk, state: Dict):
        """Incremental causal source encoding for serving: one chunk in,
        (mu_x_chunk, new_state) out. Use with
        apply(variables, chunk, state, method="encode_source_stream");
        build the initial state with init_source_stream_state(batch_size).
        Chained chunks equal one full-sequence encode exactly."""
        return self.source_encoder.stream(x_chunk, state)

    def init_source_stream_state(self, batch_size: int) -> Dict:
        """Carried-state pytree for encode_source_stream. Plain field math —
        callable on the unbound module (no variables needed)."""
        return source_stream_init_state(
            batch_size, lstm_num_layers=self.lstm_num_layers,
            lstm_hidden_dim=self.lstm_hidden_dim, dtype=self.dtype)

    def get_sequence_encoding(self, x_ph, timestep: int):
        """Reference-parity API (vae_teb_model.py:723-740): causal source
        encoding up to `timestep` inclusive via a full forward + slice."""
        return self.source_encoder.get_sequence_encoding(x_ph, timestep)

    def measure_transfer_entropy(self, y_st, y_ph, x_ph,
                                 reduce_mean: bool = False):
        """TE(source -> latent) = KL(q(z|x,y) ‖ p(z|y)) (reference
        :1194-1226). Eval mode, no sampling needed."""
        enc = self.encode(y_st, y_ph, x_ph, train=False)
        return gaussian_kld(enc["mu_prior"], enc["logvar_prior"],
                            enc["mu_post"], enc["logvar_post"],
                            reduce_mean=reduce_mean)

    get_predictions = staticmethod(stitch_predictions)
