"""Reduced-rate phase-correlation pipeline (round-4 frontend redesign).

The exact pipeline (ops.phase) synthesizes every analytic band at the full
padded rate (N_padded-point IFFT), runs the pair-rate accelerated products
at the full window length, and decimates 16x at the very end — measured at
batch 128 that is 6.6 ms of band IFFTs + 9.5 ms of pair-rate products +
2.1 ms of decimate matmul per step (BASELINE.md stage table). But every
SELECTED pair's conjugate product is band-limited far below Nyquist by
construction: the acceleration maps the i-band onto the j-band
(p = xi_j/xi_i), so a_i * conj(w_j) concentrates at baseband with support
~ (p*sigma_i + sigma_j) — for most clinical pairs a small fraction of the
padded bandwidth.

This module therefore runs the whole per-pair pipeline at the lowest
per-pair-safe sample rate:

  1. PLAN (static, float64 numpy): measure each filter's spectral support
     at `support_threshold` relative amplitude, bound each pair's product
     support (including the integer-bin demodulation residual delta =
     p*c_i - c_j), and assign the largest power-of-two decimation ds with
     support < W/2 - phi_guard, W = N_padded/ds. Pairs group by ds.
  2. BAND SYNTHESIS at rate W: gather the W-bin spectrum window centered
     on each band's center bin c_b from the full padded spectrum (the
     filter weights and the 1/ds scale folded into static window
     coefficients), one W-point split-complex IFFT per group — the band
     arrives DEMODULATED to baseband at rate N_padded/W below full.
  3. PAIR MATH at rate W: the acceleration p*angle(z) is BRANCH-SENSITIVE
     for non-integer p (e^{ip(phi+2pik)} != e^{ip phi}), so the demodulated
     band's phase is first restored to the full-rate principal branch:
     phi = wrap(phi' + ramp_b) with ramp_b(m) = 2*pi*((c_b*ds*m) mod
     N_padded)/N_padded computed as an EXACT integer mod in the plan (a
     naive fp32 ramp loses ~5e-4 rad at the window end, amplified p-fold).
     Then phs = p*phi - ramp_j folds the j-side demodulation back in, and
     cos/sin/products run identically to the exact path — the product's
     reduced-rate samples match the full-rate path's samples to fp
     accuracy; the only remaining approximation is alias fold-in.
  4. DECIMATE via a per-group composed dense operator (W -> n_out): the
     Dirichlet reconstruction of the band-limited product to the full
     padded circle, the slice to the unpadded window, the reflect pad,
     the phi low-pass, and the 16x frequency-domain decimation all
     compose into ONE float64-built complex matrix, applied as two real
     matmuls with contraction W instead of N.

Error budget: the only approximation is the spectral tail beyond the
measured support (alias fold-in bounded by `support_threshold` relative
amplitude, default 3e-4) — an order of magnitude below the bf16
correlation budget (4e-3) and two below the fp32 implementation spread
vs the torch reference (3e-2..8e-2, tests/test_phase.py). Reference
semantics being reproduced: kymatio_phase_scattering.py:211-360 (the
accelerated products + phi filtering, computed there at full rate).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import fft as sfft

_PLAN_CACHE: Dict = {}
_RECON_CACHE: Dict = {}


@dataclass(frozen=True)
class RateGroup:
    ds: int
    W: int
    # band synthesis: S_g band slots, each (source channel, gather window)
    src: np.ndarray          # (S_g,) int8: 0 = i-side spectrum, 1 = j-side
    gather_idx: np.ndarray   # (S_g, W) int32 bins into the full spectrum
    win_filt: np.ndarray     # (S_g, W) float32 filter window * (1/ds)
    # pair math
    ip: np.ndarray           # (P_g,) slot of the accelerated i-band
    jp: np.ndarray           # (P_g,) slot of the conjugated j-band
    powers: np.ndarray       # (P_g,) float32
    band_ramp: np.ndarray    # (S_g, W) float32 demodulation phase ramp,
                             # exact integer-mod per sample
    # composed decimation operator
    Mr: np.ndarray           # (W, n_out) float32
    Mi: np.ndarray           # (W, n_out) float32
    # output routing
    family: np.ndarray       # (P_g,) int8: 0 = phase, 1 = cross
    pos: np.ndarray          # (P_g,) position within the family's subset


@dataclass(frozen=True)
class ReducedPlan:
    groups: Tuple[RateGroup, ...]
    n_phase: int
    n_cross: int
    n_out: int


def _wrapped_support(filt: np.ndarray, center: int, thr: float
                     ) -> Tuple[int, int]:
    """[lo, hi] support bins (absolute, may be negative/overflow = wrap)
    of a periodized filter, measured on the window centered at `center`
    so wraparound leakage cannot inflate the interval."""
    n = len(filt)
    rolled = np.roll(filt, n // 2 - center)
    idx = np.where(np.abs(rolled) > thr * np.abs(filt).max())[0]
    return (int(idx.min()) - n // 2 + center,
            int(idx.max()) - n // 2 + center)


def _reconstruction_slice(n: int, n_padded: int, pad_left: int, W: int
                          ) -> np.ndarray:
    """(n, W) complex128: Dirichlet reconstruction of a W-rate sampling of
    a (-W/2, W/2)-band-limited N_padded-periodic signal, evaluated on the
    unpadded slice [pad_left, pad_left + n)."""
    key = (n, n_padded, pad_left, W)
    hit = _RECON_CACHE.get(key)
    if hit is not None:
        return hit
    ds = n_padded // W
    ns = np.arange(pad_left, pad_left + n, dtype=np.float64)
    ks = np.concatenate([np.arange(0, W // 2), np.arange(-W // 2, 0)]
                        ).astype(np.float64)
    # U[n, m] = (1/W) sum_k e^{2 pi i k (n - m*ds) / n_padded}
    e1 = np.exp(2j * np.pi * np.outer(ns, ks) / n_padded)      # (n, W)
    ms = np.arange(W, dtype=np.float64)
    e2 = np.exp(-2j * np.pi * np.outer(ks, ms) / W)            # (W, W)
    out = (e1 @ e2) / W
    _RECON_CACHE[key] = out
    return out


def build_reduced_plan(sc, phase_subset: Optional[Sequence[int]],
                       cross_subset: Optional[Sequence[int]],
                       support_threshold: float = 3e-4) -> ReducedPlan:
    """Static plan for `apply_reduced`. `sc` is the PhaseScattering1D
    instance (filters, pair table, padding/decimation geometry)."""
    key = (id(sc.fb), tuple(phase_subset) if phase_subset is not None else None,
           tuple(cross_subset) if cross_subset is not None else None,
           support_threshold)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit

    n_padded = sc.N_padded
    psi = np.asarray(sc.fb.psi1, np.float64)
    phi = np.asarray(sc.fb.phi_levels[0], np.float64)
    xi = sc.center_freqs
    pairs = sc.pairs
    thr = support_threshold

    centers = np.asarray(np.rint(xi.astype(np.float64) * n_padded), np.int64)
    sup = [_wrapped_support(psi[b], int(centers[b]), thr)
           for b in range(psi.shape[0])]
    half_phi = int(np.where(np.abs(phi[:n_padded // 2])
                            > thr * phi.max())[0].max()) + 1

    # ---- assign each (family, pair) a decimation group --------------------
    # (family, pos, i_band, j_band, power, delta) keyed by the group's ds
    by_ds: Dict[int, List[Tuple]] = {}
    fam_subsets = ((0, phase_subset), (1, cross_subset))
    n_phase = len(phase_subset) if phase_subset is not None else 0
    n_cross = len(cross_subset) if cross_subset is not None else 0
    for family, subset in fam_subsets:
        if subset is None:
            continue
        for pos, k in enumerate(np.asarray(subset)):
            i, j = int(pairs.i_idx[k]), int(pairs.j_idx[k])
            p = float(pairs.powers[k])
            lo_i, hi_i = sup[i]
            lo_j, hi_j = sup[j]
            c_i, c_j = int(centers[i]), int(centers[j])
            delta = p * c_i - c_j
            lo = p * (lo_i - c_i) - (hi_j - c_j) + delta
            hi = p * (hi_i - c_i) - (lo_j - c_j) + delta
            half = max(abs(lo), abs(hi))
            ds = 1
            for d in (16, 8, 4, 2):
                if half < (n_padded // d) / 2 - half_phi - 8:
                    ds = d
                    break
            by_ds.setdefault(ds, []).append(
                (family, pos, i, j, p, delta))

    # ---- build each group --------------------------------------------------
    lt_src = _phi_lt_src(sc)                        # (N, n_out) complex128
    n_out = lt_src.shape[1]
    groups = []
    for ds in sorted(by_ds):
        rows = by_ds[ds]
        W = n_padded // ds
        # band slots: (side, band) pairs; side 0 = i-spectrum, 1 = j-spectrum
        slots: Dict[Tuple[int, int], int] = {}

        def slot(side: int, band: int) -> int:
            if (side, band) not in slots:
                slots[(side, band)] = len(slots)
            return slots[(side, band)]

        ip, jp, pw, fams, poss = [], [], [], [], []
        for family, pos, i, j, p, delta in rows:
            # phase family correlates the i-channel with itself; cross
            # family conjugates the second channel (see PhaseScattering1D
            # _analyze: FHR takes the i-side + acceleration, UP the j-side)
            ip.append(slot(0, i))
            jp.append(slot(0 if family == 0 else 1, j))
            pw.append(p)
            fams.append(family)
            poss.append(pos)

        S_g = len(slots)
        src = np.zeros(S_g, np.int8)
        gather_idx = np.zeros((S_g, W), np.int32)
        win_filt = np.zeros((S_g, W), np.float32)
        band_ramp = np.zeros((S_g, W), np.float32)
        offs = np.concatenate([np.arange(0, W // 2),
                               np.arange(-W // 2, 0)]).astype(np.int64)
        ms = np.arange(W, dtype=np.int64)
        for (side, band), s in slots.items():
            src[s] = side
            c = int(centers[band])
            bins = (c + offs) % n_padded
            gather_idx[s] = bins.astype(np.int32)
            win_filt[s] = (psi[band][bins] / ds).astype(np.float32)
            # exact integer mod keeps the ramp in [0, 2*pi) at full fp32
            # precision across the whole window (a naive c*ds*m/N ramp
            # loses ~5e-4 rad by the window end, amplified p-fold below)
            band_ramp[s] = (2.0 * np.pi * ((c * ds * ms) % n_padded)
                            / n_padded).astype(np.float32)

        su = _reconstruction_slice(sc.N, n_padded, sc.pad_left, W)
        M = su.T @ lt_src                            # (W, n_out) complex128
        groups.append(RateGroup(
            ds=ds, W=W, src=src, gather_idx=gather_idx, win_filt=win_filt,
            ip=np.asarray(ip), jp=np.asarray(jp),
            powers=np.asarray(pw, np.float32), band_ramp=band_ramp,
            Mr=np.ascontiguousarray(M.real).astype(np.float32),
            Mi=np.ascontiguousarray(M.imag).astype(np.float32),
            family=np.asarray(fams, np.int8), pos=np.asarray(poss)))

    plan = ReducedPlan(groups=tuple(groups), n_phase=n_phase,
                       n_cross=n_cross, n_out=n_out)
    _PLAN_CACHE[key] = plan
    return plan


def _phi_lt_src(sc) -> np.ndarray:
    """Complex128 (N, n_out) phi-decimation operator source matrix (the
    float64 composition ops.phase._build_phi_decimation_operator casts to
    fp32 — reuse its cache through the public builder)."""
    from .phase import _build_phi_decimation_operator_c128
    return _build_phi_decimation_operator_c128(
        sc.N, sc.pad_left, sc.pad_right, sc.N_padded,
        np.asarray(sc.fb.phi_levels[0], np.float64), sc.decimation)


def apply_reduced(plan: ReducedPlan, xr_i, xi_i, xr_j, xi_j,
                  correlation_dtype=None) -> Tuple[Optional[jnp.ndarray],
                                                   Optional[jnp.ndarray]]:
    """Run the reduced-rate pipeline.

    (xr_i, xi_i): full padded spectrum of the i-side channel (FHR);
    (xr_j, xi_j): of the j-side channel (UP; pass the FHR spectrum again
    when only the phase family is planned). Returns (phase_corr,
    cross_phase_corr), each (B, P_family, n_out) in subset order (None for
    an empty family)."""
    fam_chunks: Dict[int, list] = {0: [], 1: []}
    for g in plan.groups:
        specs_r = (xr_i, xr_j)
        specs_i = (xi_i, xi_j)
        # one (S_side, W) gather per source channel, then stitch the band
        # slots back into plan order with a static permutation
        parts_r, parts_i, order = [], [], []
        for side in (0, 1):
            sel = np.where(g.src == side)[0]
            if not len(sel):
                continue
            idx = jnp.asarray(g.gather_idx[sel])
            win = jnp.asarray(g.win_filt[sel])
            parts_r.append(specs_r[side][..., idx] * win)
            parts_i.append(specs_i[side][..., idx] * win)
            order.append(sel)
        order = np.concatenate(order)
        inv = np.empty(len(order), np.int64)
        inv[order] = np.arange(len(order))
        perm = jnp.asarray(inv)
        Yr = jnp.take(jnp.concatenate(parts_r, axis=-2), perm, axis=-2)
        Yi = jnp.take(jnp.concatenate(parts_i, axis=-2), perm, axis=-2)
        zr, zi = sfft.ifft(Yr, Yi)                   # demodulated bands
        mag = sfft.modulus(zr, zi)
        ramp = jnp.asarray(g.band_ramp)
        # restore the full-rate principal phase branch: arctan2 of the
        # demodulated band + its exact demodulation ramp, rewrapped — the
        # acceleration below is branch-sensitive for non-integer powers
        ph = jnp.arctan2(zi, zr) + ramp              # (-pi, 3*pi)
        ph = jnp.where(ph > jnp.pi, ph - 2 * jnp.pi, ph)
        ipx, jpx = jnp.asarray(g.ip), jnp.asarray(g.jp)
        # p * principal phase, minus the j-side demodulation ramp (the
        # conjugate contributes e^{-i ramp_j})
        phs = (ph[..., ipx, :] * jnp.asarray(g.powers)[:, None]
               - ramp[jpx])
        ar = mag[..., ipx, :] * jnp.cos(phs)
        ai = mag[..., ipx, :] * jnp.sin(phs)
        jr, ji = zr[..., jpx, :], zi[..., jpx, :]
        Mr, Mi = jnp.asarray(g.Mr), jnp.asarray(g.Mi)
        if correlation_dtype is not None:
            ar, ai = ar.astype(correlation_dtype), ai.astype(correlation_dtype)
            jr, ji = jr.astype(correlation_dtype), ji.astype(correlation_dtype)
            Mr = Mr.astype(correlation_dtype)
            Mi = Mi.astype(correlation_dtype)
            cr, ci = sfft.cmul_conj(ar, ai, jr, ji)
            out = (jnp.matmul(cr, Mr, preferred_element_type=jnp.float32)
                   - jnp.matmul(ci, Mi, preferred_element_type=jnp.float32))
        else:
            cr, ci = sfft.cmul_conj(ar, ai, jr, ji)
            out = (jnp.matmul(cr, Mr, precision=sfft._PRECISION)
                   - jnp.matmul(ci, Mi, precision=sfft._PRECISION))
        for family in (0, 1):
            m = g.family == family
            if m.any():
                fam_chunks[family].append((g.pos[m], out[..., np.where(m)[0], :]))

    results = []
    for family, total in ((0, plan.n_phase), (1, plan.n_cross)):
        chunks = fam_chunks[family]
        if not chunks:
            results.append(None)
            continue
        cat = jnp.concatenate([c for _, c in chunks], axis=-2)
        order = np.concatenate([p for p, _ in chunks])
        inv = np.empty(total, np.int64)
        inv[order] = np.arange(len(order))
        results.append(jnp.take(cat, jnp.asarray(inv), axis=-2))
    return results[0], results[1]
