"""Split-complex matmul FFT engine vs NumPy's FFT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_teb_tpu.ops import fft as sfft

SIZES = [8, 64, 256, 512, 1024, 4096, 8192]


@pytest.mark.parametrize("n", SIZES)
def test_forward_matches_numpy(n, rng):
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
         ).astype(np.complex64)
    fr, fi = jax.jit(sfft.fft)(jnp.asarray(x.real), jnp.asarray(x.imag))
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(fr), ref.real, atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(fi), ref.imag, atol=2e-6 * scale)


@pytest.mark.parametrize("n", [256, 2048, 8192])
def test_real_input_path(n, rng):
    x = rng.standard_normal((2, 5, n)).astype(np.float32)
    fr, fi = jax.jit(lambda r: sfft.fft(r))(jnp.asarray(x))
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(fr), ref.real, atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(fi), ref.imag, atol=2e-6 * scale)


@pytest.mark.parametrize("n", [512, 8192])
def test_roundtrip(n, rng):
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
         ).astype(np.complex64)
    fr, fi = sfft.fft(jnp.asarray(x.real), jnp.asarray(x.imag))
    br, bi = sfft.ifft(fr, fi)
    np.testing.assert_allclose(np.asarray(br), x.real, atol=3e-6)
    np.testing.assert_allclose(np.asarray(bi), x.imag, atol=3e-6)


def test_ifft_scaling(rng):
    # ifft(fft(delta)) recovers delta; fft of constant concentrates at bin 0.
    n = 256
    x = np.zeros((1, n), np.float32)
    x[0, 0] = 1.0
    fr, fi = sfft.fft(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fr), np.ones((1, n)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fi), np.zeros((1, n)), atol=1e-5)


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError):
        sfft.fft(jnp.ones((1, 48)))


def test_grad_flows(rng):
    x = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32))

    def loss(v):
        fr, fi = sfft.fft(v)
        return jnp.sum(fr ** 2 + fi ** 2)

    g = jax.grad(loss)(x)
    # Parseval: d/dx sum|F x|^2 = 2 N x
    np.testing.assert_allclose(np.asarray(g), 2 * 64 * np.asarray(x),
                               rtol=1e-4)


@pytest.mark.parametrize("keep", [512, 1024, 100])
def test_fft_truncated(keep, rng):
    from vae_teb_tpu.ops.fft import fft_truncated
    x = (rng.standard_normal((2, 8192))
         + 1j * rng.standard_normal((2, 8192))).astype(np.complex64)
    fr, fi = jax.jit(lambda r, i: fft_truncated(r, i, keep))(
        jnp.asarray(x.real), jnp.asarray(x.imag))
    ref = np.fft.fft(x)[:, :keep]
    assert fr.shape == (2, keep)
    scale = np.abs(np.fft.fft(x)).max()
    np.testing.assert_allclose(np.asarray(fr), ref.real, atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(fi), ref.imag, atol=3e-6 * scale)


@pytest.mark.parametrize("n", [8, 256, 512, 8192])
def test_rfft_matches_numpy(n, rng):
    from vae_teb_tpu.ops.fft import rfft
    x = rng.standard_normal((3, n)).astype(np.float32)
    fr, fi = jax.jit(rfft)(jnp.asarray(x))
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(fr), ref.real, atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(fi), ref.imag, atol=3e-6 * scale)


@pytest.mark.parametrize("n", [8, 256, 512, 8192])
def test_irfft_roundtrip(n, rng):
    from vae_teb_tpu.ops.fft import irfft, rfft
    x = rng.standard_normal((3, n)).astype(np.float32)
    fr, fi = rfft(jnp.asarray(x))
    back = jax.jit(irfft)(fr, fi)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


@pytest.mark.parametrize("n", [256, 512])
def test_ifft_real_arbitrary_spectrum(n, rng):
    from vae_teb_tpu.ops.fft import ifft_real
    # spectrum of a genuinely complex signal: NOT conjugate-symmetric
    h = (rng.standard_normal((2, n))
         + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    got = jax.jit(ifft_real)(jnp.asarray(h.real), jnp.asarray(h.imag))
    ref = np.fft.ifft(h).real
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
