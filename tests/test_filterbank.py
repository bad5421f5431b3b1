"""Filter-bank construction vs reference golden data and analytic properties."""

import numpy as np
import pytest

from vae_teb_tpu.ops import build_filter_bank, calibrate, output_size
from vae_teb_tpu.ops.filterbank import (border_indices, compute_padding,
                                        gauss_fourier, min_support_to_pad,
                                        morlet_fourier)


def test_prod_geometry():
    """Production config (J=11,Q=4,T=16,N=5760): padding math verified
    against the executed reference (SURVEY.md §2.2)."""
    fb = build_filter_bank(11, 4, 16, 5760)
    assert fb.J_pad == 13
    assert fb.N_padded == 8192
    assert fb.pad_left == 1216 and fb.pad_right == 1216
    assert fb.n_order1 == 42
    assert fb.log2_T == 4
    # output length 360 at scale log2_T
    assert fb.ind_end[4] - fb.ind_start[4] == 360


def test_output_size_prod():
    assert output_size(11, 4, 16, max_order=1) == (1, 42)


@pytest.mark.parametrize("name", ["small_o2_phase", "prod_phase"])
def test_filters_match_reference(name, golden_loader):
    g = golden_loader(name)
    fb = build_filter_bank(int(g["J"]), int(g["Q"]), int(g["T"]), int(g["N"]))
    assert fb.N_padded == int(g["N_padded"])
    assert fb.pad_left == int(g["pad_left"])
    np.testing.assert_allclose(fb.psi1, g["psi1_filters"].real, atol=1e-7)
    np.testing.assert_allclose(fb.phi_levels[0], g["phi_filter"].real,
                               atol=1e-7)
    np.testing.assert_allclose(fb.psi1_xi, g["center_freqs"], rtol=1e-6)


def test_morlet_zero_mean():
    psi = morlet_fourier(1024, 0.35, 0.05)
    assert abs(psi[0]) < 1e-12  # exact DC cancellation
    h = np.fft.ifft(psi)
    np.testing.assert_allclose(np.abs(h).sum(), 1.0, rtol=1e-10)  # l1 norm


def test_gauss_l1_normalized():
    phi = gauss_fourier(1024, 0.00625)
    h = np.fft.ifft(phi)
    np.testing.assert_allclose(np.abs(h).sum(), 1.0, rtol=1e-10)
    assert phi[0] == phi.max()


def test_calibrate_counts():
    _, xi1, sig1, j1, xi2, sig2, j2 = calibrate(11, 4, 16)
    assert len(xi1) == 42
    assert all(a >= b for a, b in zip(xi1, xi1[1:]))  # decreasing freqs
    assert all(s > 0 for s in sig1)


def test_border_indices_halving():
    starts, ends = border_indices(3, 10, 110)
    assert list(starts) == [10, 5, 3, 2]
    assert list(ends) == [110, 55, 28, 14]


def test_compute_padding_split():
    left, right = compute_padding(13, 5760)
    assert left + right + 5760 == 8192
    assert right - left in (0, 1)


def test_min_support_prod():
    # Verified against the executed reference: min_to_pad = 243.
    assert min_support_to_pad(5760, 11, 4, 16) == 243
