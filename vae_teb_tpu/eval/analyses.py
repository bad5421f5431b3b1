"""Evaluation suite: transfer entropy, reconstruction quality, causality.

TPU re-design of the reference's analysis battery
(/root/reference/model/graph_model.py:910-1870):

  reconstruction_analysis   per-sample VAF/MSE/SNR/TE   (:1510-1680)
  te_shift_analysis         TE vs circular UP shift      (:1210-1441)
  up_ablation               TE/VAF with vs without UP    (:1682-1777)
  up_gain_sweep             TE vs UP gain 0..2x          (:1779-1870)

The shift and gain analyses *recompute the cross-phase scattering on the
fly*. The reference does this on the host, one (sample, shift) pair at a
time — 61 shifts x N samples of serial CPU scattering. Here the entire
shift/gain axis is one batched, jit-compiled device program: roll/scale the
raw UP trace, run the selected-pair cross-phase transform, normalize with
the training stats (the same traceable `normalize_field`), trim, and
measure TE — for all shifts at once.
"""

from __future__ import annotations

import pickle
from functools import partial
from typing import Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.normalize import FieldStats, normalize_field
from ..models.vae_teb import gaussian_kld
from ..ops import PhaseScattering1D
from .metrics import reconstruction_metrics

SHIFT_SECONDS_DEFAULT = tuple(range(-60, 1))  # -60s .. 0s in 1s steps
GAINS_DEFAULT = (0.0, 0.5, 1.0, 1.5, 2.0)


class ModelEvaluator:
    """Bundles a trained SeqVaeTeb (params + batch_stats) with the on-device
    scattering frontend and normalization stats for the full analysis suite.
    """

    def __init__(self, model, variables,
                 scattering: Optional[PhaseScattering1D] = None,
                 stats: Optional[Dict[str, FieldStats]] = None,
                 cross_subset: Optional[Sequence[int]] = None,
                 trim_decimated: int = 30,
                 sample_rate_hz: float = 4.0):
        self.model = model
        self.variables = {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}
        self.scattering = scattering
        self.stats = stats
        self.cross_subset = (tuple(int(i) for i in cross_subset)
                             if cross_subset is not None else None)
        self.trim = trim_decimated
        self.sample_rate_hz = sample_rate_hz

        model_ = self.model
        variables_ = self.variables

        @jax.jit
        def _te(y_st, y_ph, x_ph):
            return model_.apply(variables_, y_st, y_ph, x_ph,
                                method=model_.measure_transfer_entropy)

        @jax.jit
        def _forward(y_st, y_ph, x_ph):
            return model_.apply(variables_, y_st, y_ph, x_ph,
                                train=False, deterministic=True)

        @jax.jit
        def _metrics(y_st, y_ph, x_ph, y_raw):
            out = model_.apply(variables_, y_st, y_ph, x_ph,
                               train=False, deterministic=True)
            m = reconstruction_metrics(y_raw, out["mu_pr"])
            te = gaussian_kld(out["mu_prior"], out["logvar_prior"],
                              out["mu_post"], out["logvar_post"],
                              reduce_mean=False).mean(axis=(1, 2))
            m["kld"] = te
            return m

        self._te = _te
        self._forward = _forward
        self._metrics = _metrics

    # -- reconstruction + metric histograms -----------------------------------

    def reconstruction_analysis(self, batches: Iterable,
                                pickle_path: Optional[str] = None
                                ) -> Dict[str, np.ndarray]:
        """Per-sample VAF / MSE / SNR / mean-TE over a dataset
        (reference run_metrics_histogram_analysis, :1510-1680)."""
        acc: Dict[str, list] = {"vaf": [], "mse": [], "snr_db": [], "kld": []}
        for batch in batches:
            m = self._metrics(jnp.asarray(batch["fhr_st"]),
                              jnp.asarray(batch["fhr_ph"]),
                              jnp.asarray(batch["fhr_up_ph"]),
                              jnp.asarray(batch["fhr"]))
            for k in acc:
                acc[k].append(np.asarray(m[k]))
        out = {k: np.concatenate(v) if v else np.zeros(0)
               for k, v in acc.items()}
        if pickle_path:
            with open(pickle_path, "wb") as f:
                pickle.dump(out, f)
        return out

    def analyze_sample(self, y_st, y_ph, x_ph) -> Dict[str, np.ndarray]:
        """Forward + per-step/per-dim TE map for one (batch of) sample(s)
        (reference run_analysis_and_plot core, :987-1208)."""
        out = self._forward(jnp.asarray(y_st), jnp.asarray(y_ph),
                            jnp.asarray(x_ph))
        te_map = self._te(jnp.asarray(y_st), jnp.asarray(y_ph),
                          jnp.asarray(x_ph))
        return {"outputs": {k: np.asarray(v) for k, v in out.items()},
                "te_map": np.asarray(te_map)}

    def latent_interpolation(self, sample_a: Dict, sample_b: Dict,
                             steps: int = 8,
                             plot_prefix: Optional[str] = None,
                             animate_path: Optional[str] = None) -> Dict:
        """Posterior-mean latents of two samples, a linear path between
        them, and the decoder's coefficient reconstruction along the path
        (reference latent interpolation/animation analyses,
        utils/data_utils.py:845-925 driven by
        graph_model_utils.interpolate_latent). All `steps` decodes run as
        one batch."""
        from .metrics import interpolate_latent

        def _z(s):
            out = self._forward(jnp.asarray(s["fhr_st"][None]),
                                jnp.asarray(s["fhr_ph"][None]),
                                jnp.asarray(s["fhr_up_ph"][None]))
            return np.asarray(out["z"][0])                  # (S, D)

        za, zb = _z(sample_a), _z(sample_b)
        zs = interpolate_latent(za, zb, steps)              # (K, S, D)
        lin, mu_pr, logvar_pr = self.model.apply(
            self.variables, jnp.asarray(zs), False,
            method=self.model.decode)
        result = {"z_path": zs,
                  "linear_output": np.asarray(lin),          # (K, S, C)
                  "raw_mu": np.asarray(mu_pr),
                  "raw_logvar": np.asarray(logvar_pr)}
        z_maps = zs.transpose(0, 2, 1)                       # (K, D, S)
        y_maps = result["linear_output"].transpose(0, 2, 1)  # (K, C, S)
        len_signal = result["raw_mu"].shape[-1]
        if plot_prefix is not None:
            from .plots import plot_latent_interpolation
            plot_latent_interpolation(z_maps, y_maps, plot_prefix,
                                      len_signal=len_signal,
                                      sample_rate_hz=self.sample_rate_hz)
        if animate_path is not None:
            from .plots import animate_latent_interpolation
            animate_latent_interpolation(z_maps, y_maps, animate_path,
                                         len_signal=len_signal,
                                         sample_rate_hz=self.sample_rate_hz)
        return result

    # -- on-the-fly cross-phase recomputation ----------------------------------

    def _require_recompute(self):
        if self.scattering is None or self.stats is None \
                or "fhr_up_ph" not in self.stats:
            raise ValueError("shift/gain analyses need the scattering "
                             "frontend and fhr_up_ph normalization stats")

    def _cross_phase_te(self, fhr_b, up_variants, y_st_b, y_ph_b):
        """Core recompute pipeline: (K, N) FHR traces + (K, N) UP variants
        + (K, S, C) target coefficients -> (K,) mean TE. Entirely on
        device, batched over K (which may flatten samples x variants)."""
        sc = self.scattering
        st = self.stats["fhr_up_ph"]
        trim = self.trim
        # channel 0 = FHR (acceleration source), 1 = UP: the production ETL
        # stacking (reference create_hdf5_dataset.py:420,433-437)
        x2 = jnp.stack([fhr_b, up_variants], axis=1)
        out = sc._forward(x2, False, True, cross_subset=self.cross_subset,
                          compute_scattering=False)
        coeffs = out["cross_phase_corr"]                 # (K, C, S)
        coeffs = normalize_field(coeffs, "fhr_up_ph", st, channel_axis=-2)
        coeffs = jnp.swapaxes(coeffs, 1, 2)              # (K, S, C)
        s_full = coeffs.shape[1]
        coeffs = coeffs[:, trim:s_full - trim, :]
        # y_st / y_ph may arrive untrimmed (straight from an untrimmed
        # dataset, as the reference's raw_dataset does) — trim to match
        if y_st_b.shape[1] == s_full:
            y_st_b = y_st_b[:, trim:s_full - trim]
            y_ph_b = y_ph_b[:, trim:s_full - trim]
        te = self.model.apply(self.variables, y_st_b, y_ph_b, coeffs,
                              method=self.model.measure_transfer_entropy)
        return te.mean(axis=(1, 2))

    @partial(jax.jit, static_argnums=0)
    def _shift_te_jit(self, fhr_raw, up_raw, y_st, y_ph, shift_samples):
        """One (M, N) batch of samples x (K,) shifts -> (M, K) TE in ONE
        device program: the shift AND sample axes flatten into the leading
        batch axis of the cross-phase transform (the reference recomputes
        per (sample, shift) pair serially on the host,
        graph_model.py:1210-1441)."""
        ups = jax.vmap(lambda u: jax.vmap(
            lambda s: jnp.roll(u, s))(shift_samples))(up_raw)   # (M, K, N)
        return self._variants_te(fhr_raw, ups, y_st, y_ph)

    @partial(jax.jit, static_argnums=0)
    def _gain_te_jit(self, fhr_raw, up_raw, y_st, y_ph, gains):
        """(M, N) samples x (K,) gains -> (M, K) TE, one device program."""
        ups = gains[None, :, None] * up_raw[:, None, :]          # (M, K, N)
        return self._variants_te(fhr_raw, ups, y_st, y_ph)

    def _variants_te(self, fhr_raw, ups, y_st, y_ph):
        """(M, N) raw traces + (M, K, N) UP variants -> (M, K) TE."""
        m, k, n = ups.shape
        fhr_b = jnp.broadcast_to(fhr_raw[:, None, :], ups.shape)
        y_st_b = jnp.broadcast_to(y_st[:, None], (m, k) + y_st.shape[1:])
        y_ph_b = jnp.broadcast_to(y_ph[:, None], (m, k) + y_ph.shape[1:])
        te = self._cross_phase_te(
            fhr_b.reshape(m * k, n), ups.reshape(m * k, n),
            y_st_b.reshape((m * k,) + y_st.shape[1:]),
            y_ph_b.reshape((m * k,) + y_ph.shape[1:]))
        return te.reshape(m, k)

    @staticmethod
    def _as_sample_batch(fhr_raw, up_raw, y_st, y_ph):
        """Promote single-sample (N,)/(S,C) inputs to a batch of one."""
        fhr_raw, up_raw = jnp.asarray(fhr_raw), jnp.asarray(up_raw)
        y_st, y_ph = jnp.asarray(y_st), jnp.asarray(y_ph)
        single = fhr_raw.ndim == 1
        if single:
            fhr_raw, up_raw = fhr_raw[None], up_raw[None]
            y_st, y_ph = y_st[None], y_ph[None]
        return fhr_raw, up_raw, y_st, y_ph, single

    def te_shift_analysis(self, fhr_raw: np.ndarray, up_raw: np.ndarray,
                          y_st: np.ndarray, y_ph: np.ndarray,
                          shift_seconds: Sequence[int] = SHIFT_SECONDS_DEFAULT
                          ) -> Dict[str, np.ndarray]:
        """TE vs circular UP shift. fhr_raw/up_raw are the *untrimmed,
        unnormalized* raw traces — one sample (N,) or a batch (M, N);
        y_st/y_ph the matching normalized target coefficients. Returns TE
        of shape (K,) / (M, K). The whole (samples x shifts) grid is one
        device program (reference :1210-1441 loops host-side per pair)."""
        self._require_recompute()
        fhr_raw, up_raw, y_st, y_ph, single = self._as_sample_batch(
            fhr_raw, up_raw, y_st, y_ph)
        shift_samples = jnp.asarray(
            [int(s * self.sample_rate_hz) for s in shift_seconds])
        te = self._shift_te_jit(fhr_raw, up_raw, y_st, y_ph, shift_samples)
        return {"shift_seconds": np.asarray(shift_seconds),
                "te": np.asarray(te[0] if single else te)}

    def up_gain_sweep(self, fhr_raw, up_raw, y_st, y_ph,
                      gains: Sequence[float] = GAINS_DEFAULT
                      ) -> Dict[str, np.ndarray]:
        """TE vs UP amplitude gain, single sample or (M, N) batch
        (reference :1779-1870)."""
        self._require_recompute()
        fhr_raw, up_raw, y_st, y_ph, single = self._as_sample_batch(
            fhr_raw, up_raw, y_st, y_ph)
        te = self._gain_te_jit(fhr_raw, up_raw, y_st, y_ph,
                               jnp.asarray(gains, jnp.float32))
        return {"gains": np.asarray(gains),
                "te": np.asarray(te[0] if single else te)}

    # -- ablation ---------------------------------------------------------------

    def up_ablation(self, batches: Iterable) -> Dict[str, np.ndarray]:
        """TE and VAF with the real source input vs a zeroed source
        (reference run_up_ablation_analysis, :1682-1777)."""
        te_with, te_without, vaf_with, vaf_without = [], [], [], []
        for batch in batches:
            y_st = jnp.asarray(batch["fhr_st"])
            y_ph = jnp.asarray(batch["fhr_ph"])
            x_ph = jnp.asarray(batch["fhr_up_ph"])
            y_raw = jnp.asarray(batch["fhr"])
            m_with = self._metrics(y_st, y_ph, x_ph, y_raw)
            m_without = self._metrics(y_st, y_ph, jnp.zeros_like(x_ph), y_raw)
            te_with.append(np.asarray(m_with["kld"]))
            te_without.append(np.asarray(m_without["kld"]))
            vaf_with.append(np.asarray(m_with["vaf"]))
            vaf_without.append(np.asarray(m_without["vaf"]))
        return {"te_with_up": np.concatenate(te_with),
                "te_without_up": np.concatenate(te_without),
                "vaf_with_up": np.concatenate(vaf_with),
                "vaf_without_up": np.concatenate(vaf_without)}
