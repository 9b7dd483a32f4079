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


# ---------------------------------------------------------------------------
# reference spectral loss family (ref training/losses/spectral.py:304-750)
# ---------------------------------------------------------------------------


def _rand_btegv(rng, n_grid, v=2, e=1):
    return jnp.asarray(rng.normal(size=(1, 1, e, n_grid, v)), dtype=jnp.float32)


def test_power_spectrum_loss_formula():
    """PowerSpectrumLoss == mean over (L, V) of (S^p_L - S^t_L)^2 with
    S_L = sum_M |c_LM|^2 (ref spectral.py:416-436, PSD at
    spectral_transforms.py:217)."""
    from anemoi_tpu.ops.spectral import GaussianSHT
    from anemoi_tpu.training.losses import get_loss_function

    n = 4
    rng = np.random.default_rng(1)
    pred = _rand_btegv(rng, 128)
    target = _rand_btegv(rng, 128)
    loss = get_loss_function(
        {"name": "PowerSpectrumLoss", "transform": "gaussian_sht",
         "gaussian_n": n, "scalers": []}, {}
    )
    sht = GaussianSHT.create(n, None)

    def psd(x):
        f = np.moveaxis(np.asarray(x), -1, -2).reshape(1, 1, 1, 2, 8, 16)
        c = np.asarray(sht.analysis(jnp.asarray(f)))
        return np.sum(np.abs(c) ** 2, axis=-1)  # sum over M -> [.., V, L]

    expected = np.mean((psd(pred) - psd(target)) ** 2)
    np.testing.assert_allclose(float(loss(pred, target)), expected, rtol=1e-4)
    assert float(loss(pred, pred)) == pytest.approx(0.0, abs=1e-8)


def test_power_spectrum_loss_phase_invariant():
    """PSD ignores phase: rotating the field in longitude leaves the power
    spectrum unchanged, so PowerSpectrumLoss(pred, rotated_pred) ~ 0 while a
    plain MSE is large."""
    from anemoi_tpu.training.losses import get_loss_function

    n = 4
    rng = np.random.default_rng(2)
    field = rng.normal(size=(8, 16)).astype(np.float32)
    rolled = np.roll(field, 4, axis=1)
    pred = jnp.asarray(field.reshape(1, 1, 1, 128, 1))
    target = jnp.asarray(rolled.reshape(1, 1, 1, 128, 1))
    loss = get_loss_function(
        {"name": "PowerSpectrumLoss", "transform": "gaussian_sht",
         "gaussian_n": n, "scalers": []}, {}
    )
    mse = float(jnp.mean((pred - target) ** 2))
    assert float(loss(pred, target)) < 1e-6 * mse


def test_spectral_amse_loss():
    """AMSE (ref spectral.py:304, Subich et al. 2025): zero for identical
    fields; phase shifts are penalised through the coherence term even
    though PSDs match."""
    from anemoi_tpu.training.losses import get_loss_function

    n = 4
    rng = np.random.default_rng(3)
    loss = get_loss_function(
        {"name": "SpectralAMSELoss", "transform": "gaussian_sht",
         "gaussian_n": n, "scalers": []}, {}
    )
    pred = _rand_btegv(rng, 128, v=1)
    assert float(loss(pred, pred)) == pytest.approx(0.0, abs=1e-5)
    field = np.asarray(pred)[0, 0, 0, :, 0].reshape(8, 16)
    rolled = jnp.asarray(np.roll(field, 5, axis=1).reshape(1, 1, 1, 128, 1))
    # same PSD but decorrelated phases -> AMSE strictly positive
    assert float(loss(pred, rolled)) > 1e-2

    # hand-check the formula on the same inputs
    from anemoi_tpu.training.losses.spectral import _SpectralAdapter

    ad = _SpectralAdapter("gaussian_sht", gaussian_n=n)
    cp, ct = np.asarray(ad.to_spectral(pred)), np.asarray(ad.to_spectral(rolled))
    sp = np.sum(np.abs(cp) ** 2, axis=-2)
    st = np.sum(np.abs(ct) ** 2, axis=-2)
    cross = np.sum(cp.real * ct.real + cp.imag * ct.imag, axis=-2)
    eps = 1e-8
    amp_p, amp_t = np.sqrt(sp + eps), np.sqrt(st + eps)
    gamma = cross / (amp_p * amp_t + eps)
    amse = (amp_p - amp_t) ** 2 + 2 * np.maximum(sp, st) * (1 - gamma)
    np.testing.assert_allclose(float(loss(pred, rolled)), np.mean(amse), rtol=1e-4)


def test_log_spectral_distance():
    """LSD (ref spectral.py:499): sqrt(mean((log|T|^2 - log|P|^2)^2))."""
    from anemoi_tpu.training.losses import get_loss_function

    rng = np.random.default_rng(4)
    y, x = 4, 8
    pred = _rand_btegv(rng, y * x)
    target = _rand_btegv(rng, y * x)
    loss = get_loss_function(
        {"name": "LogFFT2Distance", "x_dim": x, "y_dim": y, "scalers": []}, {}
    )
    eps = np.finfo(np.float32).eps
    pf = np.fft.fft2(np.asarray(pred).reshape(1, 1, 1, y, x, 2), axes=(-3, -2))
    tf = np.fft.fft2(np.asarray(target).reshape(1, 1, 1, y, x, 2), axes=(-3, -2))
    ld = np.log(np.abs(tf) ** 2 + eps) - np.log(np.abs(pf) ** 2 + eps)
    expected = np.sqrt(np.mean(ld**2) + eps)
    np.testing.assert_allclose(float(loss(pred, target)), expected, rtol=1e-4)
    assert float(loss(pred, pred)) == pytest.approx(np.sqrt(eps), abs=1e-4)


def test_log_spectral_distance_sht_transform():
    from anemoi_tpu.training.losses import get_loss_function

    rng = np.random.default_rng(5)
    loss = get_loss_function(
        {"name": "LogSpectralDistance", "transform": "octahedral_sht",
         "gaussian_n": 4, "scalers": []}, {}
    )
    n_pts = 4 * 16 + 36 * 4
    pred = _rand_btegv(rng, n_pts)
    target = _rand_btegv(rng, n_pts)
    assert float(loss(pred, target)) > 0
    assert np.isfinite(float(loss(pred, target)))


def test_spectral_crps_loss():
    """SpectralCRPS (ref spectral.py:632): kernel CRPS per spectral mode over
    the ensemble dim; perfect deterministic ensemble -> ~0; matches the
    hand-computed fair kernel CRPS formula (kcrps.py:127-139)."""
    from anemoi_tpu.training.losses import get_loss_function
    from anemoi_tpu.training.losses.spectral import _SpectralAdapter

    rng = np.random.default_rng(6)
    y, x, m = 4, 8, 3
    loss = get_loss_function(
        {"name": "SpectralCRPSLoss", "transform": "fft2d", "x_dim": x,
         "y_dim": y, "scalers": []}, {}
    )
    target = _rand_btegv(rng, y * x, v=1)
    perfect = jnp.repeat(target, m, axis=2)
    assert float(loss(perfect, target)) == pytest.approx(0.0, abs=1e-6)

    pred = jnp.asarray(rng.normal(size=(1, 1, m, y * x, 1)), dtype=jnp.float32)
    ad = _SpectralAdapter("fft2d", x_dim=x, y_dim=y)
    cp = np.asarray(ad.to_spectral_flat(pred))  # [1,1,m,S,1]
    ct = np.asarray(ad.to_spectral_flat(target))
    mae = np.mean(np.abs(cp - ct), axis=2)
    pair = 0.0
    for i in range(m):
        for j in range(i + 1, m):
            pair = pair + np.abs(cp[:, :, i] - cp[:, :, j])
    expected = np.mean(mae - pair / (m * (m - 1)))
    np.testing.assert_allclose(float(loss(pred, target)), expected, rtol=1e-4)


def test_spectral_loss_rejects_spatial_grid_scaler():
    from anemoi_tpu.training.losses import get_loss_function

    w = np.ones(128, dtype=np.float32)  # spatial area weights: invalid here
    loss = get_loss_function(
        {"name": "PowerSpectrumLoss", "transform": "gaussian_sht",
         "gaussian_n": 4, "scalers": ["area"]},
        {"area": (("grid",), jnp.asarray(w))},
    )
    pred = jnp.ones((1, 1, 1, 128, 1))
    with pytest.raises(AssertionError, match="spectral"):
        loss(pred, pred * 0.5)
