import numpy as np
import pytest

import jax.numpy as jnp

from anemoi_tpu.ops.spectral import GaussianSHT, dct2, fft2, ring_power_spectrum


def test_sht_roundtrip():
    """Band-limited fields survive analysis->synthesis."""
    sht = GaussianSHT.create(8)  # F8: 16 x 32
    # construct a band-limited field from random coefficients
    rng = np.random.default_rng(0)
    coeffs = np.zeros((sht.lmax + 1, sht.lmax + 1), dtype=np.complex128)
    for l in range(min(6, sht.lmax + 1)):
        for m in range(l + 1):
            coeffs[l, m] = rng.normal() + 1j * rng.normal() * (m > 0)
    field = np.asarray(sht.synthesis(jnp.asarray(coeffs)))
    back = np.asarray(sht.analysis(jnp.asarray(field)))
    # low-degree coefficients recovered
    np.testing.assert_allclose(back[:6, :6], coeffs[:6, :6], atol=1e-6)


def test_sht_constant_field():
    sht = GaussianSHT.create(6)
    field = jnp.ones((12, 24))
    c = np.asarray(sht.analysis(field))
    # only l=0, m=0 non-zero: a_00 = sqrt(4 pi)
    np.testing.assert_allclose(c[0, 0].real, np.sqrt(4 * np.pi), rtol=1e-6)
    assert np.abs(c[1:, :]).max() < 1e-6


def test_power_spectrum_parseval():
    sht = GaussianSHT.create(8)
    rng = np.random.default_rng(1)
    coeffs = np.zeros((sht.lmax + 1, sht.lmax + 1), dtype=np.complex128)
    coeffs[3, 2] = 1.0 + 0.5j
    field = sht.synthesis(jnp.asarray(coeffs))
    p = np.asarray(sht.power_spectrum(field))
    expected = 2 * abs(1.0 + 0.5j) ** 2  # m>0 doubled
    np.testing.assert_allclose(p[3], expected, rtol=1e-5)
    assert p[[0, 1, 2, 4]].max() < 1e-8


def test_dct2_orthogonality_dc():
    x = jnp.ones((4, 8, 8))
    c = np.asarray(dct2(x))
    # unnormalised type-II DCT: DC term = 4 * sum (factor 2 per dim)
    assert abs(c[0, 0, 0] - 4 * 64.0) < 1e-3
    assert np.abs(c[0]).sum() - abs(c[0, 0, 0]) < 1e-3


def test_zonal_spectral_loss():
    from anemoi_tpu.training.losses import get_loss_function

    nlat, nlon = 4, 8
    loss = get_loss_function(
        {"name": "ZonalSpectralLoss", "nlat": nlat, "nlon": nlon, "scalers": []}, {}
    )
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(1, 1, 1, nlat * nlon, 2)), dtype=jnp.float32)
    assert float(loss(pred, pred)) == pytest.approx(0.0, abs=1e-10)
    target = jnp.asarray(rng.normal(size=pred.shape), dtype=jnp.float32)
    assert float(loss(pred, target)) > 0


def test_spherical_spectral_loss():
    from anemoi_tpu.training.losses import get_loss_function

    n = 4  # F4: 8 x 16 = 128 points
    loss = get_loss_function(
        {"name": "SphericalSpectralLoss", "gaussian_n": n, "scalers": []}, {}
    )
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(1, 1, 1, 128, 2)), dtype=jnp.float32)
    assert float(loss(pred, pred)) == pytest.approx(0.0, abs=1e-8)
    assert float(loss(pred, jnp.zeros_like(pred) + 0.1)) > 0
