"""Split-complex FFT engine for TPU, built on MXU matmuls.

TPU MXUs have no native complex dtype on this platform, so complex tensors
are carried as (re, im) float pairs and the DFT is evaluated as dense
matrix products — the standard way to map Fourier transforms onto systolic
arrays. For a length-N transform with N = N1*N2 we use Bailey's four-step
factorization:

    x(N)  ->  reshape (N1, N2)
          ->  DFT_N1 along axis -2        (matmul with an (N1, N1) factor)
          ->  * twiddle  e^{-2 pi i k1 n2 / N}
          ->  DFT_N2 along axis -1        (matmul with an (N2, N2) factor)
          ->  transpose -> reshape (N)

Each complex matmul is 4 real matmuls; everything lands on the MXU at full
throughput instead of the memory-bound butterfly passes a classic FFT would
cost. Small sizes use a single direct DFT matmul. Factor matrices and
twiddles are NumPy constants baked into the jaxpr at trace time.

Replaces the reference's cuFFT/MKL usage via torch.fft
(/root/reference/kymatio/kymatio/scattering1d/backend/torch_backend.py:106-128).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
# A split-complex tensor: (real, imag). imag may be None for real tensors.
SC = Tuple[Array, Optional[Array]]

_DIRECT_MAX = 256  # sizes up to this use one direct DFT matmul

# fp32 matmuls in the transform must be exact-precision: scattering
# coefficients feed normalization statistics and golden-parity tests.
_PRECISION = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _dft_factors(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of the n x n forward DFT matrix W[j,k] = e^{-2 pi i jk/n}."""
    jk = np.outer(np.arange(n), np.arange(n)).astype(np.float64)
    ang = -2.0 * math.pi * jk / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of e^{-2 pi i k1 n2 / (n1 n2)}, shape (n1, n2)."""
    k1 = np.arange(n1)[:, None].astype(np.float64)
    n2v = np.arange(n2)[None, :].astype(np.float64)
    ang = -2.0 * math.pi * k1 * n2v / (n1 * n2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _split(n: int) -> Tuple[int, int]:
    """Balanced power-of-two factorization n = n1 * n2 with n1 >= n2."""
    log2n = n.bit_length() - 1
    n1 = 1 << ((log2n + 1) // 2)
    return n1, n // n1


def _matmul_dft(re: Array, im: Optional[Array], n: int, inverse: bool
                ) -> Tuple[Array, Array]:
    """Direct DFT along the last axis via one complex matmul (4 real ones).

    y = x @ W^T with W[j,k] = e^{-+2 pi i jk / n}; W is symmetric so the
    transpose is free. Inverse flips the sine sign (1/n scaling is applied
    once by the caller at the top level).
    """
    c_np, s_np = _dft_factors(n)
    c = jnp.asarray(c_np)
    s = jnp.asarray(-s_np if inverse else s_np)
    dot = lambda a, b: jnp.matmul(a, b, precision=_PRECISION)
    if im is None:
        return dot(re, c), dot(re, s)
    return dot(re, c) - dot(im, s), dot(re, s) + dot(im, c)


def _fft_lastaxis(re: Array, im: Optional[Array], inverse: bool
                  ) -> Tuple[Array, Array]:
    n = re.shape[-1]
    if n & (n - 1):
        raise ValueError(f"FFT length must be a power of two, got {n}")
    if n <= _DIRECT_MAX:
        return _matmul_dft(re, im, n, inverse)

    n1, n2 = _split(n)
    lead = re.shape[:-1]
    re2 = re.reshape(lead + (n1, n2))
    im2 = None if im is None else im.reshape(lead + (n1, n2))

    # Step 1: DFT over the n1 axis. Move it last, transform, move back —
    # XLA folds the transposes into the matmul's dimension numbers.
    re_t = jnp.swapaxes(re2, -1, -2)
    im_t = None if im2 is None else jnp.swapaxes(im2, -1, -2)
    ar, ai = _fft_lastaxis(re_t, im_t, inverse)
    ar = jnp.swapaxes(ar, -1, -2)
    ai = jnp.swapaxes(ai, -1, -2)

    # Step 2: twiddles.
    tc_np, ts_np = _twiddle(n1, n2)
    tc = jnp.asarray(tc_np)
    ts = jnp.asarray(-ts_np if inverse else ts_np)
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc

    # Step 3: DFT over the n2 axis (already last).
    cr, ci = _fft_lastaxis(br, bi, inverse)

    # Step 4: output index is k1 + n1*k2 -> transpose to (k2, k1).
    cr = jnp.swapaxes(cr, -1, -2).reshape(lead + (n,))
    ci = jnp.swapaxes(ci, -1, -2).reshape(lead + (n,))
    return cr, ci


def fft(re: Array, im: Optional[Array] = None) -> Tuple[Array, Array]:
    """Forward DFT along the last axis ('backward' norm: no scaling)."""
    return _fft_lastaxis(re, im, inverse=False)


@lru_cache(maxsize=None)
def _half_twiddle(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of W^k = e^{-2 pi i k / n} for k = 0..n/2-1."""
    k = np.arange(n // 2).astype(np.float64)
    ang = -2.0 * math.pi * k / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _reverse_mod(x: Array) -> Array:
    """x[(M-k) mod M] along the last axis."""
    return jnp.concatenate([x[..., :1], x[..., :0:-1]], axis=-1)


def rfft(x: Array) -> Tuple[Array, Array]:
    """Forward DFT of a REAL signal via the even/odd packing trick.

    Packs x into a half-length complex signal z[m] = x[2m] + i x[2m+1],
    runs one N/2 complex FFT, and untangles with O(N) elementwise math —
    ~2x fewer matmul FLOPs and ~2x less transform traffic than feeding the
    real signal through the complex path. Returns the FULL length-N
    spectrum (re, im) so downstream full-spectrum consumers (analytic
    wavelet multiplies, Fourier-period subsampling) are unchanged.

    Equivalent of the reference backend's rfft
    (/root/reference/kymatio/kymatio/scattering1d/backend/torch_backend.py:106-112),
    which likewise exploits real input on the forward transform.
    """
    n = x.shape[-1]
    if n < 4 or n % 2:
        return _fft_lastaxis(x, None, inverse=False)
    m = n // 2
    xz = x.reshape(x.shape[:-1] + (m, 2))
    zr, zi = xz[..., 0], xz[..., 1]
    fr, fi = _fft_lastaxis(zr, zi, inverse=False)
    fr_rev = _reverse_mod(fr)
    fi_rev = _reverse_mod(fi)
    er = (fr + fr_rev) * 0.5
    ei = (fi - fi_rev) * 0.5
    our = (fi + fi_rev) * 0.5
    oui = (fr_rev - fr) * 0.5
    wc_np, ws_np = _half_twiddle(n)
    wc, ws = jnp.asarray(wc_np), jnp.asarray(ws_np)
    tr = our * wc - oui * ws
    ti = our * ws + oui * wc
    re = jnp.concatenate([er + tr, er - tr], axis=-1)
    im = jnp.concatenate([ei + ti, ei - ti], axis=-1)
    return re, im


def irfft(re: Array, im: Array) -> Array:
    """Inverse DFT of a CONJUGATE-SYMMETRIC full-length spectrum -> real
    signal, via one N/2 complex IFFT (inverse of the rfft packing trick).

    The caller asserts Hermitian symmetry (spectrum of a real signal put
    through real symmetric filters and Fourier-period folding); only the
    k = 0..N/2-1 half of (re, im) is read.
    """
    n = re.shape[-1]
    if n < 4 or n % 2:
        rr, _ = _fft_lastaxis(re, im, inverse=True)
        return rr / n
    m = n // 2
    xr_lo, xr_hi = re[..., :m], re[..., m:]
    xi_lo, xi_hi = im[..., :m], im[..., m:]
    xer = (xr_lo + xr_hi) * 0.5
    xei = (xi_lo + xi_hi) * 0.5
    dr = (xr_lo - xr_hi) * 0.5
    di = (xi_lo - xi_hi) * 0.5
    wc_np, ws_np = _half_twiddle(n)  # e^{-2 pi i k/n}; inverse needs conj
    wc, ws = jnp.asarray(wc_np), jnp.asarray(-ws_np)
    xor_ = dr * wc - di * ws
    xoi = dr * ws + di * wc
    zr = xer - xoi
    zi = xei + xor_
    yr, yi = _fft_lastaxis(zr, zi, inverse=True)
    out = jnp.stack([yr, yi], axis=-1).reshape(re.shape[:-1] + (n,))
    return out / m


def ifft_real(re: Array, im: Array) -> Array:
    """Real part of the inverse DFT of an ARBITRARY spectrum.

    Re(IFFT(H)) == IFFT(Hermitian part of H), so Hermitianize in O(N)
    elementwise and reuse the half-size irfft path — the imaginary output
    the callers discard (reference unpads only the real part,
    /root/reference/hdf5_dataset/kymatio_phase_scattering.py:268-273) is
    never computed.
    """
    n = re.shape[-1]
    if n < 4 or n % 2:
        rr, _ = _fft_lastaxis(re, im, inverse=True)
        return rr / n
    hr = (re + _reverse_mod(re)) * 0.5
    hi = (im - _reverse_mod(im)) * 0.5
    return irfft(hr, hi)


def fft_truncated(re: Array, im: Optional[Array], keep: int
                  ) -> Tuple[Array, Array]:
    """Forward DFT returning only bins [0, keep).

    In the four-step factorization the output index is k = k1 + n1*k2, so
    keeping k < keep == m*n1 means evaluating only m columns of the
    second-stage DFT — the low-pass + frequency-crop decimation consumer
    (ops.phase._phi_decimate) never pays for the 15/16 of the spectrum it
    would immediately discard. Falls back to a full transform + slice when
    keep doesn't align to the factorization.
    """
    n = re.shape[-1]
    if keep >= n:
        return _fft_lastaxis(re, im, inverse=False)
    if n <= _DIRECT_MAX or n & (n - 1):
        fr, fi = _fft_lastaxis(re, im, inverse=False)
        return fr[..., :keep], fi[..., :keep]
    # Stage cost is ~ n1 (first DFT) + keep/n1 (kept columns of the second):
    # minimized at n1 ~ sqrt(keep), NOT the balanced sqrt(n) split a full
    # transform wants. For n=8192, keep=512 this is 4n*48 vs 4n*132 FLOPs.
    if keep & (keep - 1) == 0 and keep >= 4:
        n1 = 1 << ((keep.bit_length() - 1 + 1) // 2)
        n1 = min(n1, _DIRECT_MAX)
    else:
        n1, _ = _split(n)
    if keep % n1 or (n // n1) > 1024:
        fr, fi = _fft_lastaxis(re, im, inverse=False)
        return fr[..., :keep], fi[..., :keep]
    n2 = n // n1
    m = keep // n1
    lead = re.shape[:-1]
    re2 = re.reshape(lead + (n1, n2))
    im2 = None if im is None else im.reshape(lead + (n1, n2))
    re_t = jnp.swapaxes(re2, -1, -2)
    im_t = None if im2 is None else jnp.swapaxes(im2, -1, -2)
    ar, ai = _fft_lastaxis(re_t, im_t, inverse=False)
    ar = jnp.swapaxes(ar, -1, -2)
    ai = jnp.swapaxes(ai, -1, -2)
    tc_np, ts_np = _twiddle(n1, n2)
    tc, ts = jnp.asarray(tc_np), jnp.asarray(ts_np)
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc
    # second-stage DFT, only the first m output columns
    c_np, s_np = _dft_factors(n2)
    c = jnp.asarray(c_np[:, :m])
    s = jnp.asarray(s_np[:, :m])
    dot = lambda a, b: jnp.matmul(a, b, precision=_PRECISION)
    cr = dot(br, c) - dot(bi, s)
    ci = dot(br, s) + dot(bi, c)
    cr = jnp.swapaxes(cr, -1, -2).reshape(lead + (keep,))
    ci = jnp.swapaxes(ci, -1, -2).reshape(lead + (keep,))
    return cr, ci


def ifft(re: Array, im: Optional[Array] = None) -> Tuple[Array, Array]:
    """Inverse DFT along the last axis (scaled by 1/N)."""
    n = re.shape[-1]
    rr, ri = _fft_lastaxis(re, im, inverse=True)
    return rr / n, ri / n


def modulus(re: Array, im: Array) -> Array:
    """|z| (the reference's ModulusStable semantics: sqrt(re^2+im^2);
    XLA's sqrt grad at 0 is inf, matching use only at nonzero energies)."""
    return jnp.sqrt(re * re + im * im)


def cmul(ar: Array, ai: Array, br: Array, bi: Array) -> Tuple[Array, Array]:
    """(ar+i ai) * (br+i bi)."""
    return ar * br - ai * bi, ar * bi + ai * br


def cmul_conj(ar: Array, ai: Array, br: Array, bi: Array) -> Tuple[Array, Array]:
    """(ar+i ai) * conj(br+i bi)."""
    return ar * br + ai * bi, ai * br - ar * bi
