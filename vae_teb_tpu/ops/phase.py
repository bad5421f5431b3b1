"""Phase-harmonic correlation transforms + FHR/UP coefficient selection.

TPU-native equivalent of the reference's phase-scattering frontend
(/root/reference/hdf5_dataset/kymatio_phase_scattering.py:11-811). The
reference walks Python pair loops at trace time inside torch; here the pair
table (i_idx, j_idx, powers) is a *static* NumPy precompute and the transform
is one gather + fused polar math + one batched matmul-FFT low-pass, entirely
inside jit (split-complex arithmetic — see ops.fft). Selected-pair subsets
(44 within-channel / 130 cross-channel for the production J=11,Q=4,T=16
config) can be applied *before* the correlation is computed, skipping ~95%
of the work the reference performs and then throws away — identical selected
outputs, a fraction of the FLOPs and HBM traffic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as sfft
from .filterbank import FilterBank, build_filter_bank
from .scattering import Scattering1D, reflect_pad, tukey_window


_DECIM_OP_CACHE: Dict = {}


def _build_phi_decimation_operator(n: int, pad_left: int, pad_right: int,
                                   n_padded: int, phi_f: np.ndarray,
                                   dec: int
                                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Dense (n -> n_out) operator equal to the chained phi-decimate:

        out = Re( IFFT_keep( phi[:keep] * FFT_{n_padded}(reflect_pad(c))
                             [:keep] ) )[start : start + n//dec]

    for complex input c = cr + i*ci (the reference's `_apply_phi_filter`,
    kymatio_phase_scattering.py:233-273). Returns (LrT, LiT), both
    (n, n_out) float32, such that out = cr @ LrT - ci @ LiT.

    Built in float64 so the composed operator is MORE accurate than the
    fp32 transform cascade it replaces; the reflect-pad fold reuses the
    runtime `reflect_pad` on an index ramp, so the padding semantics are
    identical by construction.
    """
    lt_src = _build_phi_decimation_operator_c128(
        n, pad_left, pad_right, n_padded, phi_f, dec)
    return (np.ascontiguousarray(lt_src.real).astype(np.float32),
            np.ascontiguousarray(lt_src.imag).astype(np.float32))


def _build_phi_decimation_operator_c128(n: int, pad_left: int,
                                        pad_right: int, n_padded: int,
                                        phi_f: np.ndarray, dec: int
                                        ) -> np.ndarray:
    """Float64/complex128 source matrix of the phi-decimation operator
    (see _build_phi_decimation_operator). Also composed with the
    reduced-rate reconstruction in ops.phase_reduced."""
    cache_key = (n, pad_left, pad_right, n_padded, dec,
                 hash(phi_f[:n_padded // dec].tobytes()))
    hit = _DECIM_OP_CACHE.get(cache_key)
    if hit is not None:
        return hit
    # source-index map of the chained reflect pad (values are copies, so
    # padding an index ramp yields, per padded position, its source index)
    ramp = np.arange(n, dtype=np.float64)
    idx = np.asarray(reflect_pad(jnp.asarray(ramp), pad_left, pad_right))
    idx = np.rint(idx).astype(np.int64)                      # (n_padded,)
    keep = n_padded // dec
    k = np.arange(keep, dtype=np.float64)
    j = np.arange(n_padded, dtype=np.float64)
    fwd = np.exp(-2j * np.pi * np.outer(k, j) / n_padded)    # (keep, n_pad)
    a = phi_f[:keep, None] * fwd
    t = np.arange(keep, dtype=np.float64)
    inv = np.exp(2j * np.pi * np.outer(t, k) / keep) / keep  # (keep, keep)
    l_pad = inv @ a                                          # (keep, n_pad)
    start = pad_left // dec
    n_out = min(start + n // dec, keep) - start
    l_pad = l_pad[start:start + n_out]
    lt_src = np.zeros((n, n_out), np.complex128)
    np.add.at(lt_src, idx, l_pad.T)                          # fold padding
    _DECIM_OP_CACHE[cache_key] = lt_src
    return lt_src


# ---------------------------------------------------------------------------
# Static pair table
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PairTable:
    """All ordered filter pairs (i, j) with xi_j >= xi_i.

    powers[k] = xi_j / xi_i is the phase-acceleration exponent; autoc_idx
    marks the i == j diagonal. Mirrors the reference's coupling precompute
    (kymatio_phase_scattering.py:134-160).
    """
    i_idx: np.ndarray   # (P,) int
    j_idx: np.ndarray   # (P,) int
    powers: np.ndarray  # (P,) float
    autoc_idx: np.ndarray  # indices into the pair axis where i == j

    def __len__(self) -> int:
        return len(self.i_idx)


def build_pair_table(center_freqs: np.ndarray) -> PairTable:
    # float32 on purpose: the acceleration powers and selection thresholds
    # are defined on single-precision center frequencies (the reference
    # registers them as float32 buffers, kymatio_phase_scattering.py:128),
    # and exact-power-of-two ratios like 32.0 sit directly on the selection
    # boundary — float64 would tip them over it.
    xi = np.asarray(center_freqs, dtype=np.float32)
    n = len(xi)
    ii, jj, pw = [], [], []
    for i in range(n):
        for j in range(n):
            if xi[j] >= xi[i]:
                ii.append(i)
                jj.append(j)
                pw.append(np.float32(xi[j] / xi[i]) if xi[i] > 1e-8 else 1.0)
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    autoc = np.where(ii == jj)[0]
    return PairTable(i_idx=ii, j_idx=jj, powers=np.asarray(pw), autoc_idx=autoc)


# ---------------------------------------------------------------------------
# Coefficient selection (clinical FHR/UP heuristics, reference :501-760)
# ---------------------------------------------------------------------------

def select_phase_coefficients(pairs: PairTable, center_freqs: np.ndarray,
                              min_freq: float = 0.006,
                              max_harmonic_power: float = 8.0,
                              include_autocorr: bool = True,
                              harmonic_ratios: Sequence[int] = (2, 3),
                              power_tolerance: float = 0.1) -> Dict:
    """Within-channel phase-pair selection: autocorrelations plus near-integer
    harmonic ratios, restricted to clinically relevant frequencies.

    For J=11,Q=4,T=16 this selects 44 pairs (24 autocorr + 20 harmonic-2),
    matching the reference's documented breakdown
    (kymatio_phase_scattering.py:679-697).
    """
    xi = np.asarray(center_freqs)
    freq_ok = xi >= min_freq
    masks = {}
    if include_autocorr:
        auto = np.zeros(len(pairs), dtype=bool)
        auto[pairs.autoc_idx] = True
        masks["autocorr"] = freq_ok[pairs.i_idx] & freq_ok[pairs.j_idx] & auto
    for ratio in harmonic_ratios:
        near = np.abs(pairs.powers - ratio) < power_tolerance
        masks[f"harmonic_{ratio}"] = (
            freq_ok[pairs.i_idx] & freq_ok[pairs.j_idx]
            & near & (pairs.powers <= max_harmonic_power))
    optimal = np.zeros(len(pairs), dtype=bool)
    for m in masks.values():
        optimal |= m
    return {
        "masks": masks,
        "optimal_mask": optimal,
        "selected_indices": np.where(optimal)[0],
        "n_selected": int(optimal.sum()),
    }


def select_cross_coefficients(pairs: PairTable, center_freqs: np.ndarray,
                              up_max_freq: float = 0.02,
                              fhr_min_freq: float = 0.04,
                              fhr_max_freq: float = 0.5,
                              max_harmonic_power: float = 32.0) -> Dict:
    """Cross-channel (UP -> FHR) pair selection: slow contraction-band
    filters on the source channel against variability-band filters on the
    target channel. 130 pairs for the production config
    (kymatio_phase_scattering.py:693-697).
    """
    xi = np.asarray(center_freqs)
    up_band = xi < up_max_freq
    fhr_band = (xi >= fhr_min_freq) & (xi <= fhr_max_freq)
    mask = (up_band[pairs.i_idx] & fhr_band[pairs.j_idx]
            & (pairs.powers >= 1.0) & (pairs.powers <= max_harmonic_power))
    return {
        "cross_mask": mask,
        "up_band_mask": up_band,
        "fhr_band_mask": fhr_band,
        "selected_indices": np.where(mask)[0],
        "n_selected": int(mask.sum()),
    }


# ---------------------------------------------------------------------------
# The transform
# ---------------------------------------------------------------------------

class PhaseScattering1D:
    """Scattering + phase-harmonic correlations as one jittable frontend.

    Produces the three coefficient families the VAE consumes:
      scattering       (B, 1+C1[+C2], N/T)   averaged scattering
      phase_corr       (B, P_sel, N/T)        within-channel phase harmonics
      cross_phase_corr (B, P_sel, N/T)        cross-channel (src -> tgt)

    `phase_subset` / `cross_subset` restrict computation to a static list of
    pair indices (e.g. the 44/130 FHR selections); `None` computes all pairs
    as the reference does.
    """

    def __init__(self, J: int, Q: int, T: int, shape: int,
                 max_order: int = 1, oversampling: int = 0,
                 tukey_alpha: Optional[float] = None,
                 dtype=jnp.float32, correlation_dtype=None,
                 reduced_rate: bool = False,
                 support_threshold: float = 3e-4):
        self.J, self.Q, self.T, self.N = J, Q, T, int(shape)
        self.tukey_alpha = tukey_alpha
        self.dtype = dtype
        # Reduced-rate pipeline (subset paths only): run each selected
        # pair's band synthesis, polar acceleration, and conjugate product
        # at the lowest alias-safe sample rate instead of the full padded
        # rate, with a composed (W -> n_out) decimation operator — see
        # ops.phase_reduced. Error bounded by `support_threshold` (the
        # relative amplitude at which filter spectral tails are truncated).
        self.reduced_rate = reduced_rate
        self.support_threshold = support_threshold
        # Mixed-precision correlation stage (training-path option). The
        # pair-rate intermediates (accelerated products, (B, P, N)) are the
        # frontend's dominant HBM traffic and the phi-decimate matmul its
        # dominant FLOPs; with correlation_dtype=bfloat16 the products are
        # computed/stored in bf16 and the decimate matmul runs at native
        # MXU rate with fp32 accumulation. Band filtering, modulus/arctan2
        # and the scattering path stay fp32 (phase errors would be
        # amplified by the acceleration powers). Golden-parity/analysis
        # callers leave this None => bit-identical to the fp32 path.
        self.correlation_dtype = correlation_dtype

        fb = build_filter_bank(J, Q, T, self.N)
        self.fb: FilterBank = fb
        self.scattering = Scattering1D(J, Q, T, shape, max_order=max_order,
                                       oversampling=oversampling, dtype=dtype,
                                       filter_bank=fb)
        self.center_freqs = fb.psi1_xi.astype(np.float32)
        self.pairs = build_pair_table(self.center_freqs)

        self.psi1_f = jnp.asarray(fb.psi1, dtype=dtype)  # real in Fourier
        self.phi_f = jnp.asarray(fb.phi_levels[0], dtype=dtype)
        self.pad_left, self.pad_right = fb.pad_left, fb.pad_right
        self.N_padded = fb.N_padded

        # Static decimation factor chosen so the phase outputs line up with
        # the scattering temporal grid (reference :287-291).
        t_out = self.scattering.n_out
        self.decimation = max(1, self.N // t_out) if self.N > t_out else 1

        win = tukey_window(self.N, tukey_alpha)
        self._window = jnp.asarray(win, dtype=dtype) if tukey_alpha else None

        # The phi-decimate chain (reflect-pad -> truncated FFT -> x phi ->
        # real IFFT -> decimated unpad) is LINEAR in its input, so it
        # collapses into one (N -> N/dec) dense operator applied as two real
        # matmuls — MXU-shaped (contraction 5760, output 360) instead of a
        # cascade of tiny ragged DFT stages, pad materializations, and
        # transposes. Measured on v5e: 7.2 ms -> ~1 ms for the batch-32
        # 130-pair cross path. Built once in float64 (exact), cast to fp32.
        self._decim_LrT = self._decim_LiT = None
        self._decim_LrT_lp = self._decim_LiT_lp = None
        if self.decimation > 1:
            lrt, lit = _build_phi_decimation_operator(
                self.N, self.pad_left, self.pad_right, self.N_padded,
                np.asarray(fb.phi_levels[0], np.float64), self.decimation)
            self._decim_LrT = jnp.asarray(lrt, dtype)   # (N, n_out)
            self._decim_LiT = jnp.asarray(lit, dtype)
            if correlation_dtype is not None:
                self._decim_LrT_lp = jnp.asarray(lrt, correlation_dtype)
                self._decim_LiT_lp = jnp.asarray(lit, correlation_dtype)

    # -- building blocks ----------------------------------------------------

    def _filter_all(self, x: jnp.ndarray,
                    rows: Optional[np.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Apply first-order wavelets: (..., N) real ->
        ((..., C, N), (..., C, N)) split-complex analytic band signals.
        Reference `_apply_filters` (:220-231). `rows` restricts to a static
        filter subset — with the 44/130 selections only ~60% of the bands
        are ever consumed, so the (batch, C, N_padded) inverse FFT (the
        phase path's dominant cost) shrinks accordingly."""
        xp = reflect_pad(x.astype(self.dtype), self.pad_left, self.pad_right)
        xr, xi = sfft.rfft(xp)
        return self._bands_from_spectrum(xr, xi, rows)

    def _bands_from_spectrum(self, xr: jnp.ndarray, xi: jnp.ndarray,
                             rows: Optional[np.ndarray] = None
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Analytic band signals from the PADDED input spectrum (..., N_pad)."""
        filt = self.psi1_f if rows is None else self.psi1_f[np.asarray(rows)]
        yr = xr[..., None, :] * filt
        yi = xi[..., None, :] * filt
        fr, fi = sfft.ifft(yr, yi)
        sl = slice(self.pad_left, self.pad_left + self.N)
        return fr[..., sl], fi[..., sl]

    def _phi_decimate(self, cr: jnp.ndarray, ci: jnp.ndarray) -> jnp.ndarray:
        """Low-pass + frequency-domain decimation of complex correlations.
        Reference `_apply_phi_filter` (:233-273): re-pad, FFT, multiply phi,
        crop the spectrum to N_padded/dec (time decimation), IFFT, and unpad
        with decimated border arithmetic. Returns the real part.

        When dec > 1 the whole chain is applied as one precomputed dense
        operator (see _build_phi_decimation_operator): two large matmuls
        whose contraction (N) and output (N/dec) dims tile the MXU, versus
        a cascade of pad materializations, sub-tile DFT factor matmuls, and
        transposes. Same values to ~1e-6 (the operator is composed in
        float64)."""
        if self._decim_LrT_lp is not None and cr.dtype == self._decim_LrT_lp.dtype:
            # low-precision inputs: single-pass MXU matmul, fp32 accumulate
            # (vs 6 bf16 passes for the fp32/HIGHEST path below)
            return (jnp.matmul(cr, self._decim_LrT_lp,
                               preferred_element_type=jnp.float32)
                    - jnp.matmul(ci, self._decim_LiT_lp,
                                 preferred_element_type=jnp.float32))
        if self._decim_LrT is not None:
            return (jnp.matmul(cr, self._decim_LrT,
                               precision=sfft._PRECISION)
                    - jnp.matmul(ci, self._decim_LiT,
                                 precision=sfft._PRECISION))
        if cr.dtype != self.dtype:
            # correlation_dtype with decimation == 1: no dense operator
            # exists, so the advertised single-pass MXU decimate does not
            # apply — run the FFT fallback in full precision rather than
            # letting bf16 operands promote implicitly inside the DFT.
            cr, ci = cr.astype(self.dtype), ci.astype(self.dtype)
        dec = self.decimation
        cr = reflect_pad(cr, self.pad_left, self.pad_right)
        ci = reflect_pad(ci, self.pad_left, self.pad_right)
        if dec > 1:
            # only the kept low-frequency bins are ever consumed: compute
            # just those (truncated second FFT stage) and multiply by the
            # matching low-pass slice
            keep = self.N_padded // dec
            hr, hi = sfft.fft_truncated(cr, ci, keep)
            phi = self.phi_f[:keep]
            hr = hr * phi
            hi = hi * phi
        else:
            hr, hi = sfft.fft(cr, ci)
            hr = hr * self.phi_f
            hi = hi * self.phi_f
        sr = sfft.ifft_real(hr, hi)
        if dec > 1:
            start = self.pad_left // dec
            end = min(start + self.N // dec, sr.shape[-1])
            return sr[..., start:end]
        return sr[..., self.pad_left:self.pad_left + self.N]

    @staticmethod
    def _accelerate(zr, zi, power):
        """A e^{i phi} -> A e^{i power phi} in polar form (reference :211-218)."""
        mag = sfft.modulus(zr, zi)
        ph = jnp.arctan2(zi, zr) * power
        return mag * jnp.cos(ph), mag * jnp.sin(ph)

    def _pair_correlation(self, ir, ii_, jr, ji, powers) -> jnp.ndarray:
        """Accelerated conjugate products + low-pass/decimate for already-
        gathered pair operands (the subset=None / all-pairs paths). Honors
        `correlation_dtype` the same way `_banded_product` does: the polar
        math stays fp32, only the pair-rate product tensors are cast."""
        ar, ai = self._accelerate(ir, ii_, powers[..., :, None])
        if self.correlation_dtype is not None:
            dt = self.correlation_dtype
            ar, ai = ar.astype(dt), ai.astype(dt)
            jr, ji = jr.astype(dt), ji.astype(dt)
        cr, ci = sfft.cmul_conj(ar, ai, jr, ji)
        return self._phi_decimate(cr, ci)

    @staticmethod
    def _banded_product(ir_b, ii_b, ip, jr_b, ji_b, jp, powers,
                        out_dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Accelerated conjugate products from BAND tensors + static pair
        index vectors. modulus/arctan2 run once per band (the expensive
        transcendentals); only cos/sin of the scaled phase and the product
        run at pair rate. Same values as gather-then-accelerate.

        `out_dtype` (see `correlation_dtype`) casts the four product
        operands just before the complex multiply: the polar math (where
        acceleration powers amplify phase error) stays fp32, only the
        pair-rate (B, P, N) product tensors are stored low-precision —
        these dominate the frontend's HBM write traffic."""
        mag = sfft.modulus(ir_b, ii_b)
        ph = jnp.arctan2(ii_b, ir_b)
        phs = ph[:, ip] * powers[..., :, None]
        ar = mag[:, ip] * jnp.cos(phs)
        ai = mag[:, ip] * jnp.sin(phs)
        jr_p, ji_p = jr_b[:, jp], ji_b[:, jp]
        if out_dtype is not None:
            ar, ai = ar.astype(out_dtype), ai.astype(out_dtype)
            jr_p, ji_p = jr_p.astype(out_dtype), ji_p.astype(out_dtype)
        return sfft.cmul_conj(ar, ai, jr_p, ji_p)

    def _subset(self, subset: Optional[np.ndarray]):
        if subset is None:
            ii, jj, pw = self.pairs.i_idx, self.pairs.j_idx, self.pairs.powers
        else:
            subset = np.asarray(subset)
            ii = self.pairs.i_idx[subset]
            jj = self.pairs.j_idx[subset]
            pw = self.pairs.powers[subset]
        return jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(pw, self.dtype)

    # -- public API -----------------------------------------------------------

    def phase_correlation(self, filtered, subset=None) -> jnp.ndarray:
        """Split-complex (B, C1, N) filtered signals -> (B, P, N/dec) real."""
        fr, fi = filtered
        ii, jj, pw = self._subset(subset)
        return self._pair_correlation(fr[:, ii], fi[:, ii],
                                      fr[:, jj], fi[:, jj], pw)

    def cross_phase_correlation(self, filtered, subset=None,
                                apply_low_pass: bool = True) -> jnp.ndarray:
        """Split-complex (B, 2, C1, N) -> (B, P, N/dec) real, channel 0
        accelerated against channel 1's conjugate (reference :303-360)."""
        fr, fi = filtered
        ii, jj, pw = self._subset(subset)
        ir, ii_ = fr[:, 0, ii], fi[:, 0, ii]
        jr, ji = fr[:, 1, jj], fi[:, 1, jj]
        if not apply_low_pass:
            ar, ai = self._accelerate(ir, ii_, pw[..., :, None])
            cr, _ = sfft.cmul_conj(ar, ai, jr, ji)
            return cr
        return self._pair_correlation(ir, ii_, jr, ji, pw)

    @partial(jax.jit, static_argnums=(0, 2, 3),
             static_argnames=("phase_subset", "cross_subset",
                              "compute_scattering"))
    def _forward(self, x, compute_phase, compute_cross_phase,
                 phase_subset=None, cross_subset=None,
                 compute_scattering=True):
        if self._window is not None:
            x = x * self._window
        scat_in = x[:, 0, :] if x.ndim == 3 else x
        out = {}
        if compute_scattering:
            out["scattering"] = self.scattering(scat_in)
        # The reference computes the two families in separate forward calls
        # (create_hdf5_dataset.py:421-432); here both flags may be set at
        # once (round-1 review: the old elif silently dropped `phase`).
        if compute_cross_phase:
            if cross_subset is not None and self.reduced_rate:
                from .phase_reduced import apply_reduced, build_reduced_plan
                plan = build_reduced_plan(self, None, cross_subset,
                                          self.support_threshold)
                x0 = reflect_pad(x[:, 0, :].astype(self.dtype),
                                 self.pad_left, self.pad_right)
                x1 = reflect_pad(x[:, 1, :].astype(self.dtype),
                                 self.pad_left, self.pad_right)
                xr0, xi0 = sfft.rfft(x0)
                xr1, xi1 = sfft.rfft(x1)
                _, cc = apply_reduced(plan, xr0, xi0, xr1, xi1,
                                      self.correlation_dtype)
                out["cross_phase_corr"] = cc
            elif cross_subset is not None:
                # filter only the bands the selected pairs touch, per channel
                sub = np.asarray(cross_subset)
                ii = self.pairs.i_idx[sub]
                jj = self.pairs.j_idx[sub]
                pw = jnp.asarray(self.pairs.powers[sub], self.dtype)
                rows_i = np.unique(ii)
                rows_j = np.unique(jj)
                f0r, f0i = self._filter_all(x[:, 0, :], rows_i)
                f1r, f1i = self._filter_all(x[:, 1, :], rows_j)
                ip = jnp.asarray(np.searchsorted(rows_i, ii))
                jp = jnp.asarray(np.searchsorted(rows_j, jj))
                cr, ci = self._banded_product(f0r, f0i, ip, f1r, f1i, jp, pw,
                                              self.correlation_dtype)
                out["cross_phase_corr"] = self._phi_decimate(cr, ci)
            else:
                filtered = self._filter_all(x)  # (B, 2, C1, N)
                out["cross_phase_corr"] = self.cross_phase_correlation(
                    filtered, None)
        if compute_phase:
            sig = x[:, 0, :] if x.ndim == 3 else x
            if phase_subset is not None and self.reduced_rate:
                from .phase_reduced import apply_reduced, build_reduced_plan
                plan = build_reduced_plan(self, phase_subset, None,
                                          self.support_threshold)
                sp = reflect_pad(sig.astype(self.dtype), self.pad_left,
                                 self.pad_right)
                sr, si = sfft.rfft(sp)
                pc, _ = apply_reduced(plan, sr, si, sr, si,
                                      self.correlation_dtype)
                out["phase_corr"] = pc
            elif phase_subset is not None:
                sub = np.asarray(phase_subset)
                ii = self.pairs.i_idx[sub]
                jj = self.pairs.j_idx[sub]
                pw = jnp.asarray(self.pairs.powers[sub], self.dtype)
                rows = np.unique(np.concatenate([ii, jj]))
                fr, fi = self._filter_all(sig, rows)
                ip = jnp.asarray(np.searchsorted(rows, ii))
                jp = jnp.asarray(np.searchsorted(rows, jj))
                cr, ci = self._banded_product(fr, fi, ip, fr, fi, jp, pw,
                                              self.correlation_dtype)
                out["phase_corr"] = self._phi_decimate(cr, ci)
            else:
                filtered = self._filter_all(sig)
                out["phase_corr"] = self.phase_correlation(filtered, None)
        return out

    def __call__(self, x: jnp.ndarray, compute_phase: bool = True,
                 compute_cross_phase: bool = False,
                 phase_subset: Optional[Sequence[int]] = None,
                 cross_subset: Optional[Sequence[int]] = None,
                 compute_scattering: bool = True) -> Dict[str, jnp.ndarray]:
        """x: (B, N) or (B, C, N). Cross-phase requires C == 2 with channel 0
        the source (UP) and channel 1 the target (FHR); order the channels on
        the caller side (the reference passes phase_channels=[...] instead)."""
        if x.ndim not in (2, 3):
            raise ValueError(f"input must be (B, N) or (B, C, N), got {x.shape}")
        if x.shape[-1] != self.N:
            raise ValueError(f"signal length {x.shape[-1]} != configured N={self.N}")
        if compute_cross_phase and (x.ndim != 3 or x.shape[1] != 2):
            raise ValueError("cross-channel correlation requires (B, 2, N) input "
                             "with channel 0 = source, channel 1 = target")
        ps = tuple(int(i) for i in phase_subset) if phase_subset is not None else None
        cs = tuple(int(i) for i in cross_subset) if cross_subset is not None else None
        return self._forward(x, compute_phase, compute_cross_phase,
                             phase_subset=ps, cross_subset=cs,
                             compute_scattering=compute_scattering)

    @partial(jax.jit, static_argnums=(0,),
             static_argnames=("phase_subset", "cross_subset",
                              "compute_scattering"))
    def _analyze(self, fhr, up, phase_subset, cross_subset,
                 compute_scattering=True):
        """Fused production forward: scattering + within-channel phase +
        cross-channel phase in ONE traced graph.

        Unlike chaining `_forward` calls (the reference runs the transform
        twice per record, create_hdf5_dataset.py:421-432), the padded FHR
        spectrum is transformed once and the FHR analytic bands are computed
        once for the UNION of the bands the two selections touch; both
        correlation families then share a single low-pass/decimate FFT over
        the concatenated pair axis.
        """
        if self._window is not None:
            fhr = fhr * self._window
            if up is not None:
                up = up * self._window

        p_sub = np.asarray(phase_subset)
        pii = self.pairs.i_idx[p_sub]
        pjj = self.pairs.j_idx[p_sub]
        ppw = jnp.asarray(self.pairs.powers[p_sub], self.dtype)
        # Cross-channel convention (matches the reference ETL,
        # create_hdf5_dataset.py:419-432 with x=stack([fhr,up]) and
        # phase_channels=[0,1]): channel 0 (FHR) takes the i-side filters
        # and the acceleration; channel 1 (UP) takes the j-side conjugate.
        c_sub = np.asarray(cross_subset) if cross_subset is not None else None
        if c_sub is not None:
            cii = self.pairs.i_idx[c_sub]
            cjj = self.pairs.j_idx[c_sub]
            cpw = jnp.asarray(self.pairs.powers[c_sub], self.dtype)
            rows_fhr = np.unique(np.concatenate([pii, pjj, cii]))
            rows_up = np.unique(cjj)
        else:
            rows_fhr = np.unique(np.concatenate([pii, pjj]))

        xp = reflect_pad(fhr.astype(self.dtype), self.pad_left, self.pad_right)
        xr, xi = sfft.rfft(xp)

        out = {}
        if compute_scattering:
            out["scattering"] = self.scattering.scatter_spectrum(xr, xi)

        if self.reduced_rate:
            from .phase_reduced import apply_reduced, build_reduced_plan
            plan = build_reduced_plan(self, phase_subset,
                                      c_sub if up is not None else None,
                                      self.support_threshold)
            if c_sub is not None and up is not None:
                upd = reflect_pad(up.astype(self.dtype), self.pad_left,
                                  self.pad_right)
                ur, ui = sfft.rfft(upd)
            else:
                ur, ui = xr, xi
            pc, cc = apply_reduced(plan, xr, xi, ur, ui,
                                   self.correlation_dtype)
            out["phase_corr"] = pc
            if cc is not None:
                out["cross_phase_corr"] = cc
            return out

        fr_b, fi_b = self._bands_from_spectrum(xr, xi, rows_fhr)
        ip = jnp.asarray(np.searchsorted(rows_fhr, pii))
        jp = jnp.asarray(np.searchsorted(rows_fhr, pjj))
        cr_p, ci_p = self._banded_product(fr_b, fi_b, ip, fr_b, fi_b, jp, ppw,
                                          self.correlation_dtype)

        if c_sub is not None and up is not None:
            ur_b, ui_b = self._filter_all(up, rows_up)
            cip = jnp.asarray(np.searchsorted(rows_fhr, cii))
            cjp = jnp.asarray(np.searchsorted(rows_up, cjj))
            cr_c, ci_c = self._banded_product(fr_b, fi_b, cip,
                                              ur_b, ui_b, cjp, cpw,
                                              self.correlation_dtype)
            # one low-pass/decimate FFT over both families
            n_p = cr_p.shape[1]
            dec = self._phi_decimate(jnp.concatenate([cr_p, cr_c], axis=1),
                                     jnp.concatenate([ci_p, ci_c], axis=1))
            out["phase_corr"] = dec[:, :n_p]
            out["cross_phase_corr"] = dec[:, n_p:]
        else:
            out["phase_corr"] = self._phi_decimate(cr_p, ci_p)
        return out

    def analyze(self, fhr: jnp.ndarray, up: Optional[jnp.ndarray] = None,
                phase_subset: Optional[Sequence[int]] = None,
                cross_subset: Optional[Sequence[int]] = None,
                compute_scattering: bool = True) -> Dict[str, jnp.ndarray]:
        """Production forward pass: all three coefficient families at once.

        fhr, up: (B, N) real signals. `phase_subset` defaults to the
        optimal 44-pair FHR selection, `cross_subset` (requires `up`) to the
        130-pair UP->FHR selection. Returns {"scattering", "phase_corr",
        "cross_phase_corr"}, each (B, C, N_out).
        """
        if fhr.ndim != 2 or fhr.shape[-1] != self.N:
            raise ValueError(f"fhr must be (B, {self.N}), got {fhr.shape}")
        if up is not None and up.shape != fhr.shape:
            raise ValueError("up must match fhr's shape")
        sel = None
        if phase_subset is None or (cross_subset is None and up is not None):
            sel = self.optimal_fhr_selection()
        if phase_subset is None:
            phase_subset = sel["phase_selection"]["selected_indices"]
        if cross_subset is None and up is not None:
            cross_subset = sel["cross_selection"]["selected_indices"]
        ps = tuple(int(i) for i in phase_subset)
        cs = (tuple(int(i) for i in cross_subset)
              if cross_subset is not None and up is not None else None)
        return self._analyze(fhr, up, phase_subset=ps, cross_subset=cs,
                             compute_scattering=compute_scattering)

    def optimal_fhr_selection(self) -> Dict:
        """Bundle of both selections + masks, reference :635-760.

        min_freq follows the reference's J-dependent policy (:712-717):
        0.006 Hz for J >= 11 (clinical 2-minute-prediction band), 0.003 Hz
        for smaller J to keep enough scales."""
        min_freq = 0.006 if self.J >= 11 else 0.003
        phase_sel = select_phase_coefficients(self.pairs, self.center_freqs,
                                              min_freq=min_freq)
        cross_sel = select_cross_coefficients(self.pairs, self.center_freqs)
        return {
            "phase_selection": phase_sel,
            "cross_selection": cross_sel,
            "use_phase_mask": phase_sel["optimal_mask"],
            "use_cross_mask": cross_sel["cross_mask"],
            "total_selected_features": (self.scattering.output_channels
                                        + phase_sel["n_selected"]
                                        + cross_sel["n_selected"]),
        }

    def verify_phase_correlation_properties(self, x, tol: float = 1e-6) -> Dict:
        """Runtime self-checks: autocorrelation positivity, xi ordering,
        powers >= 1 (reference :762-811)."""
        results = {"passed": True, "details": {}}
        xt = x[:1] if x.ndim == 2 else x[:1, 0]
        filtered = self._filter_all(jnp.asarray(xt))
        pc = self.phase_correlation(filtered)
        auto = np.asarray(pc[0, self.pairs.autoc_idx, :])
        if np.any(auto < -tol):
            results["passed"] = False
            results["details"]["autocorr_negative"] = float(auto.min())
        xi = self.center_freqs
        if np.any(xi[self.pairs.j_idx] < xi[self.pairs.i_idx] - tol):
            results["passed"] = False
            results["details"]["frequency_ordering"] = True
        if np.any(self.pairs.powers < 1.0 - tol):
            results["passed"] = False
            results["details"]["invalid_powers"] = True
        return results
