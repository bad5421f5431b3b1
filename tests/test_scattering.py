"""Scattering transform: golden parity, shapes, properties, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_teb_tpu.ops import Scattering1D, reflect_pad, subsample_fourier


@pytest.mark.parametrize("name", ["small_o2_phase", "small_o2_cross",
                                  "prod_phase", "prod_cross"])
def test_golden_parity(name, golden_loader):
    g = golden_loader(name)
    m = Scattering1D(int(g["J"]), int(g["Q"]), int(g["T"]), int(g["N"]),
                     max_order=int(g["max_order"]))
    x = g["x"][:, 0, :] if g["x"].ndim == 3 else g["x"]
    s = np.asarray(m(jnp.asarray(x)))
    ref = g["scattering"]
    assert s.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.abs(s - ref).max() < 2e-5 * scale


def test_shapes_prod():
    m = Scattering1D(11, 4, 16, 5760, max_order=1)
    assert m.output_channels == 43
    assert m.n_out == 360
    out = m(jnp.ones((2, 5760)))
    assert out.shape == (2, 43, 360)


def test_batch_shape_agnostic():
    m = Scattering1D(6, 2, 8, 1024, max_order=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 1024)),
                    dtype=jnp.float32)
    out = m(x)
    flat = m(x.reshape(6, 1024))
    assert out.shape[:2] == (2, 3)
    np.testing.assert_allclose(np.asarray(out).reshape(6, *out.shape[2:]),
                               np.asarray(flat), atol=1e-6)


def test_constant_signal_order1_near_zero():
    """Wavelets have zero mean: a constant input produces (near-)zero
    first-order coefficients; order 0 equals the smoothed constant."""
    m = Scattering1D(6, 2, 8, 1024, max_order=1)
    out = np.asarray(m(jnp.full((1, 1024), 3.0)))
    assert np.abs(out[0, 1:, :]).max() < 1e-4
    np.testing.assert_allclose(out[0, 0, :], 3.0, rtol=1e-3)


def test_differentiable():
    m = Scattering1D(6, 2, 8, 1024, max_order=2)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1024)),
                    dtype=jnp.float32)
    g = jax.grad(lambda v: jnp.sum(m(v) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_reflect_pad_matches_numpy():
    x = jnp.asarray(np.arange(8, dtype=np.float32)[None])
    out = np.asarray(reflect_pad(x, 5, 3))
    ref = np.pad(np.arange(8, dtype=np.float32)[None], [(0, 0), (5, 3)],
                 mode="reflect")
    np.testing.assert_array_equal(out, ref)


def test_reflect_pad_longer_than_signal():
    x = jnp.asarray(np.arange(4, dtype=np.float32)[None])
    out = np.asarray(reflect_pad(x, 7, 7))[0]
    assert out.shape[-1] == 18
    # interior is intact
    np.testing.assert_array_equal(out[7:11], np.arange(4))


def test_subsample_fourier_is_time_decimation(rng):
    """Period-mean in Fourier == picking every k-th time sample."""
    n, k = 64, 4
    x = rng.standard_normal(n)
    xh = np.fft.fft(x)
    folded = np.asarray(subsample_fourier(jnp.asarray(xh.real), k)) + \
        1j * np.asarray(subsample_fourier(jnp.asarray(xh.imag), k))
    dec = np.fft.ifft(folded)
    np.testing.assert_allclose(dec.real, x[::k], atol=1e-6)


def test_meta_prod():
    """Coefficient metadata matches the reference layout (order-major)."""
    m = Scattering1D(11, 4, 16, 5760, max_order=1)
    meta = m.meta()
    assert meta["order"].shape == (43,)
    assert meta["order"][0] == 0 and np.all(meta["order"][1:] == 1)
    assert np.isnan(meta["xi"][0][0])
    np.testing.assert_allclose(meta["xi"][1][0], m.fb.psi1_xi[0])
    m2 = Scattering1D(6, 2, 8, 1024, max_order=2)
    meta2 = m2.meta()
    assert len(meta2["order"]) == m2.output_channels
    assert np.sum(meta2["order"] == 2) == m2._n2_pairs
