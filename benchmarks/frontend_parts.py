"""Stage-level attribution of the production frontend on the real chip.

Times CUMULATIVE prefixes of the `PhaseScattering1D._analyze` pipeline
(production J=11,Q=4,T=16, the 44/130 selections, batch 128) with the
scan-differenced AOT methodology of bench.py / frontend_ab.py, so the
difference between consecutive rows is the cost of ONE stage:

  scat      scattering only (scatter_spectrum from the shared rfft)
  rfft      reflect-pad + rfft of both channels
  bands     + analytic band synthesis (the (B, C_rows, N_pad) IFFTs)
  polar     + band-rate modulus/arctan2
  pairs     + pair-rate accelerated products (gather, cos/sin, cmul_conj)
  full      + phi-decimate matmul (== _analyze minus scattering)

Usage: python benchmarks/frontend_parts.py [--batch N] [--fp32]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vae_teb_tpu.ops import PhaseScattering1D
from vae_teb_tpu.ops import fft as sfft
from vae_teb_tpu.ops.scattering import reflect_pad


def main():
    B, N = 128, 5760
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    cdt = None if "--fp32" in sys.argv else jnp.bfloat16
    sc = PhaseScattering1D(J=11, Q=4, T=16, shape=N, max_order=1,
                           correlation_dtype=cdt)
    sel = sc.optimal_fhr_selection()
    p_sub = np.asarray(sel["phase_selection"]["selected_indices"])
    c_sub = np.asarray(sel["cross_selection"]["selected_indices"])
    pii, pjj = sc.pairs.i_idx[p_sub], sc.pairs.j_idx[p_sub]
    ppw = jnp.asarray(sc.pairs.powers[p_sub], sc.dtype)
    cii, cjj = sc.pairs.i_idx[c_sub], sc.pairs.j_idx[c_sub]
    cpw = jnp.asarray(sc.pairs.powers[c_sub], sc.dtype)
    rows_fhr = np.unique(np.concatenate([pii, pjj, cii]))
    rows_up = np.unique(cjj)
    ip = jnp.asarray(np.searchsorted(rows_fhr, pii))
    jp = jnp.asarray(np.searchsorted(rows_fhr, pjj))
    cip = jnp.asarray(np.searchsorted(rows_fhr, cii))
    cjp = jnp.asarray(np.searchsorted(rows_up, cjj))
    print(f"bands: fhr {len(rows_fhr)} up {len(rows_up)} "
          f"pairs {len(p_sub)}+{len(c_sub)} corr_dtype={cdt}", flush=True)

    def consume(*ts):
        return sum(jnp.sum(t.astype(jnp.float32)) for t in ts)

    def _rfft(fhr, up):
        xp = reflect_pad(fhr.astype(sc.dtype), sc.pad_left, sc.pad_right)
        upd = reflect_pad(up.astype(sc.dtype), sc.pad_left, sc.pad_right)
        return sfft.rfft(xp), sfft.rfft(upd)

    def stage_scat(fhr, up):
        (xr, xi), _ = _rfft(fhr, up)
        return consume(sc.scattering.scatter_spectrum(xr, xi))

    def stage_rfft(fhr, up):
        (xr, xi), (ur, ui) = _rfft(fhr, up)
        return consume(xr, xi, ur, ui)

    def _bands(fhr, up):
        (xr, xi), (ur, ui) = _rfft(fhr, up)
        fr, fi = sc._bands_from_spectrum(xr, xi, rows_fhr)
        gr, gi = sc._bands_from_spectrum(ur, ui, rows_up)
        return fr, fi, gr, gi

    def stage_bands(fhr, up):
        return consume(*_bands(fhr, up))

    def stage_polar(fhr, up):
        fr, fi, gr, gi = _bands(fhr, up)
        mag = sfft.modulus(fr, fi)
        ph = jnp.arctan2(fi, fr)
        return consume(mag, ph, gr, gi)

    def _pairs(fhr, up):
        fr, fi, gr, gi = _bands(fhr, up)
        cr_p, ci_p = sc._banded_product(fr, fi, ip, fr, fi, jp, ppw, cdt)
        cr_c, ci_c = sc._banded_product(fr, fi, cip, gr, gi, cjp, cpw, cdt)
        return cr_p, ci_p, cr_c, ci_c

    def stage_pairs(fhr, up):
        return consume(*_pairs(fhr, up))

    def stage_full(fhr, up):
        cr_p, ci_p, cr_c, ci_c = _pairs(fhr, up)
        dec = sc._phi_decimate(jnp.concatenate([cr_p, cr_c], axis=1),
                               jnp.concatenate([ci_p, ci_c], axis=1))
        return consume(dec)

    rng_np = np.random.default_rng(0)
    fhr = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))
    up = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))

    def run_k(fn, k):
        @jax.jit
        def run(acc0):
            def body(acc, i):
                fi_ = fhr + (jnp.float32(i) + acc * 1e-20) * 1e-6
                return acc + fn(fi_, up), None
            acc, _ = jax.lax.scan(body, acc0, jnp.arange(k))
            return acc
        compiled = run.lower(jnp.float32(0.0)).compile()
        float(np.asarray(compiled(jnp.float32(0.0))))  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(compiled(jnp.float32(0.0))))
            best = min(best, time.perf_counter() - t0)
        return best

    prev = 0.0
    for label, fn in (("scat", stage_scat), ("rfft", stage_rfft),
                      ("bands", stage_bands), ("polar", stage_polar),
                      ("pairs", stage_pairs), ("full", stage_full)):
        k_lo, k_hi = 2, 12
        dt = (run_k(fn, k_hi) - run_k(fn, k_lo)) / (k_hi - k_lo) * 1000
        delta = dt - prev if label not in ("scat", "rfft") else float("nan")
        print(f"{label:6s} {dt:8.2f} ms/step  (+{delta:6.2f} vs prev stage)",
              flush=True)
        if label != "scat":
            prev = dt


if __name__ == "__main__":
    main()
