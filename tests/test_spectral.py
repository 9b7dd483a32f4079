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


def test_reduced_sht_roundtrip_o32():
    """Band-limited fields on the octahedral o32 grid round-trip through
    ReducedSHT (analysis -> synthesis) to fp32 precision.  Band limit stays
    below the shortest polar ring's Nyquist (20 pts -> m <= 9), the same
    validity regime as the reference's OctahedralSHT."""
    import jax.numpy as jnp

    from anemoi_tpu.ops.spectral import ReducedSHT

    sht = ReducedSHT.create(32, lmax=9, kind="octahedral")
    rng = np.random.default_rng(5)
    coeffs = rng.normal(size=(sht.lmax + 1, sht.lmax + 1)) + 1j * rng.normal(
        size=(sht.lmax + 1, sht.lmax + 1)
    )
    # physical (real) field: m=0 coefficients real, m <= l only
    l_idx, m_idx = np.meshgrid(np.arange(10), np.arange(10), indexing="ij")
    coeffs = np.where(m_idx <= l_idx, coeffs, 0.0)
    coeffs[:, 0] = coeffs[:, 0].real
    field = np.asarray(sht.synthesis(jnp.asarray(coeffs)))
    assert field.shape == (sht.n_points,)
    back = np.asarray(sht.analysis(jnp.asarray(field)))
    np.testing.assert_allclose(back, coeffs, rtol=1e-4, atol=1e-5)
    # and synthesis of the re-analysed coefficients reproduces the field
    field2 = np.asarray(sht.synthesis(jnp.asarray(back)))
    np.testing.assert_allclose(field2, field, rtol=1e-4, atol=1e-5)


def test_reduced_sht_power_spectrum_peaks_at_degree():
    import jax.numpy as jnp

    from anemoi_tpu.ops.spectral import ReducedSHT

    sht = ReducedSHT.create(32, lmax=9, kind="octahedral")
    for l0, m0 in [(3, 0), (7, 4)]:
        coeffs = np.zeros((10, 10), np.complex128)
        coeffs[l0, m0] = 1.0 if m0 == 0 else 0.5 + 0.3j
        field = sht.synthesis(jnp.asarray(coeffs))
        spec = np.asarray(sht.power_spectrum(field))
        assert spec.argmax() == l0, (l0, m0, spec)


def test_reduced_sht_constant_field():
    import jax.numpy as jnp

    from anemoi_tpu.ops.spectral import ReducedSHT

    sht = ReducedSHT.create(16, lmax=7, kind="octahedral")
    field = jnp.ones((sht.n_points,))
    c = np.asarray(sht.analysis(field))
    # only the (0,0) coefficient: integral of Y00 over the sphere
    np.testing.assert_allclose(c[0, 0].real, np.sqrt(4 * np.pi), rtol=1e-5)
    others = np.abs(c).copy()
    others[0, 0] = 0.0
    assert others.max() < 1e-4


def test_spherical_spectral_loss_octahedral():
    import jax.numpy as jnp

    from anemoi_tpu.training.losses.spectral import SphericalSpectralLoss

    loss = SphericalSpectralLoss(gaussian_n=16, lmax=7, grid_kind="octahedral")
    rng = np.random.default_rng(3)
    n_pts = loss.sht.n_points
    pred = jnp.asarray(rng.normal(size=(1, 1, 1, n_pts, 2)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(1, 1, 1, n_pts, 2)), jnp.float32)
    v = float(loss(pred, target))
    assert np.isfinite(v) and v > 0
    assert float(loss(pred, pred)) < 1e-10


def test_spectral_ornstein_octahedral(rng):
    """SpectralOrnsteinConnection on an o16 grid (the grids models run on)."""
    import jax
    import jax.numpy as jnp

    from anemoi_tpu.models.layers.residual import SpectralOrnsteinConnection
    from anemoi_tpu.ops.spectral import ReducedSHT

    sht = ReducedSHT.create(16, kind="octahedral")
    conn = SpectralOrnsteinConnection(
        prog_idx=(0, 1), num_vars=3, gaussian_n=16, grid_kind="octahedral",
        lmax=7,
    )
    x = jnp.asarray(rng.normal(size=(1, 2, 1, sht.n_points, 3)), jnp.float32)
    params = conn.init(jax.random.PRNGKey(0), x)
    out = conn.apply(params, x)
    assert out.shape == (1, 1, 1, sht.n_points, 3)
    assert np.isfinite(np.asarray(out)).all()
    # forcing column (idx 2) stays zero
    np.testing.assert_allclose(np.asarray(out)[..., 2], 0.0, atol=1e-6)
