"""Spectral transforms (JAX).

Equivalents of /root/reference/models/src/anemoi/models/layers/spectral_transforms.py
and spectral_helpers.py (RegularSHT :228, FFT2D :51, DCT2D :188):
- spherical-harmonic analysis/synthesis on full Gaussian grids F<n>
  (per-ring rFFT over longitude + Gauss-Legendre quadrature over latitude
  with precomputed associated Legendre matrices)
- FFT2D / DCT2D for regular grids

The SHT matrices are host-precomputed numpy (static per grid); the transforms
themselves are jit-friendly matmuls + FFTs (MXU/VPU work).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def associated_legendre(lmax: int, x: np.ndarray) -> np.ndarray:
    """Normalised associated Legendre P_l^m(x) for 0<=m<=l<=lmax.

    Returns [lmax+1, lmax+1, len(x)] with orthonormal (spherical-harmonic)
    normalisation; entries with m>l are zero.  Standard stable recurrence.
    """
    n = len(x)
    p = np.zeros((lmax + 1, lmax + 1, n))
    p[0, 0] = 1.0 / np.sqrt(4.0 * np.pi)
    somx2 = np.sqrt(np.clip(1.0 - x * x, 0.0, None))
    # diagonal: P_m^m
    for m in range(1, lmax + 1):
        p[m, m] = -np.sqrt((2 * m + 1) / (2.0 * m)) * somx2 * p[m - 1, m - 1]
    # off-diagonal: P_{m+1}^m
    for m in range(lmax):
        p[m + 1, m] = np.sqrt(2 * m + 3.0) * x * p[m, m]
    # upward recurrence in l
    for m in range(lmax + 1):
        for l in range(m + 2, lmax + 1):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
            p[l, m] = a * (x * p[l - 1, m] - b * p[l - 2, m])
    return p


@dataclass(frozen=True)
class GaussianSHT:
    """Spherical-harmonic transform on a full Gaussian grid F<n>
    (2n latitudes x 4n longitudes), truncation lmax (default 2n-1)."""

    nlat: int
    nlon: int
    lmax: int
    plm: np.ndarray  # [lmax+1, lmax+1, nlat] legendre at gaussian nodes
    weights: np.ndarray  # [nlat] quadrature weights

    @classmethod
    @lru_cache(maxsize=8)
    def create(cls, n: int, lmax: int | None = None) -> "GaussianSHT":
        nodes, weights = np.polynomial.legendre.leggauss(2 * n)
        # north->south ordering to match grid generation
        order = np.argsort(-nodes)
        nodes, weights = nodes[order], weights[order]
        lmax = lmax if lmax is not None else 2 * n - 1
        plm = associated_legendre(lmax, nodes)
        return cls(nlat=2 * n, nlon=4 * n, lmax=lmax, plm=plm, weights=weights)

    def analysis(self, field: jnp.ndarray) -> jnp.ndarray:
        """[..., nlat, nlon] -> complex coefficients [..., lmax+1, lmax+1]
        (l index, m index; m <= l)."""
        fm = jnp.fft.rfft(field, axis=-1) * (2.0 * np.pi / self.nlon)  # [..., nlat, nlon/2+1]
        fm = fm[..., : self.lmax + 1]
        # integrate over latitude with gaussian weights
        wplm = jnp.asarray(self.plm * self.weights[None, None, :])  # [L, M, nlat]
        return jnp.einsum("...jm,lmj->...lm", fm, wplm)

    def synthesis(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Inverse: coefficients [..., L, M] -> field [..., nlat, nlon]."""
        plm = jnp.asarray(self.plm)  # [L, M, nlat]
        fm = jnp.einsum("...lm,lmj->...jm", coeffs, plm)  # [..., nlat, M]
        full = jnp.zeros(fm.shape[:-1] + (self.nlon // 2 + 1,), dtype=fm.dtype)
        full = full.at[..., : self.lmax + 1].set(fm)
        return jnp.fft.irfft(full, n=self.nlon, axis=-1) * self.nlon

    def power_spectrum(self, field: jnp.ndarray) -> jnp.ndarray:
        """Per-degree power: sum_m |a_lm|^2 (m>0 doubled). [..., lmax+1]."""
        c = self.analysis(field)
        p = jnp.abs(c) ** 2
        p = p.at[..., :, 1:].multiply(2.0)
        return jnp.sum(p, axis=-1)


@dataclass(frozen=True)
class ReducedSHT:
    """Spherical-harmonic transform on REDUCED Gaussian grids (octahedral
    O<n> and FFT-friendly N-style grids) -- the grids anemoi models actually
    run on.  Equivalent of the reference's ReducedSHT / OctahedralSHT
    (/root/reference/models/src/anemoi/models/layers/spectral_transforms.py:264,328).

    TPU-native formulation: the per-ring variable-length rFFT (awkward under
    XLA's static shapes) becomes one batched ring-DFT MATMUL over a padded
    [nlat, Nmax] layout -- cos/sin design tensors are precomputed per ring on
    the host, masked beyond each ring's true length, and the whole transform
    is three einsums that ride the MXU:

        field [..., n_points] --gather--> [..., nlat, Nmax]
        fm    = field_pad x {cos, sin}[j, n, m]      (ring DFT)
        a_lm  = fm x (w_j * Pbar_lm(x_j))            (Legendre quadrature)

    and the transpose chain for synthesis.  As with the full-grid transform,
    quadrature is exact for l <= lmax only when every ring resolves m (short
    polar rings alias the highest m, exactly like the reference's
    implementation on the same grids).
    """

    lmax: int
    nlat: int
    n_points: int
    ring_lengths: np.ndarray  # [nlat]
    gather_idx: np.ndarray  # [nlat, Nmax] flat point per pad slot (pad=n)
    flat_idx: np.ndarray  # [n_points] pad slot per flat point
    cos_a: np.ndarray  # [nlat, Nmax, M] analysis cos, weighted 2pi/Nj
    sin_a: np.ndarray  # [nlat, Nmax, M]
    cos_s: np.ndarray  # [nlat, M, Nmax] synthesis cos with m-factor
    sin_s: np.ndarray  # [nlat, M, Nmax]
    wplm: np.ndarray  # [L, M, nlat] quadrature-weighted legendre
    plm: np.ndarray  # [L, M, nlat]

    @classmethod
    @lru_cache(maxsize=8)
    def create(cls, n: int, lmax: int | None = None, kind: str = "octahedral") -> "ReducedSHT":
        from anemoi_tpu.graphs.generate.gaussian import (
            octahedral_ring_lengths,
            reduced_ring_lengths,
        )

        nodes, weights = np.polynomial.legendre.leggauss(2 * n)
        order = np.argsort(-nodes)  # north -> south, matching grid generation
        nodes, weights = nodes[order], weights[order]
        rings = (
            octahedral_ring_lengths(n) if kind == "octahedral" else reduced_ring_lengths(n)
        ).astype(np.int64)
        nlat = 2 * n
        lmax = lmax if lmax is not None else n - 1
        m_dim = lmax + 1
        n_points = int(rings.sum())
        nmax = int(rings.max())

        gather_idx = np.full((nlat, nmax), n_points, dtype=np.int32)
        flat_idx = np.empty(n_points, dtype=np.int32)
        cos_a = np.zeros((nlat, nmax, m_dim), dtype=np.float32)
        sin_a = np.zeros((nlat, nmax, m_dim), dtype=np.float32)
        cos_s = np.zeros((nlat, m_dim, nmax), dtype=np.float32)
        sin_s = np.zeros((nlat, m_dim, nmax), dtype=np.float32)
        m = np.arange(m_dim)
        factor = np.where(m == 0, 1.0, 2.0)
        off = 0
        for j, nj in enumerate(rings):
            nj = int(nj)
            ids = np.arange(off, off + nj, dtype=np.int32)
            gather_idx[j, :nj] = ids
            flat_idx[off : off + nj] = j * nmax + np.arange(nj)
            lam = 2.0 * np.pi * np.arange(nj) / nj  # lon_0 = 0 per ring
            phase = m[None, :] * lam[:, None]  # [nj, M]
            cos_a[j, :nj] = np.cos(phase) * (2.0 * np.pi / nj)
            sin_a[j, :nj] = -np.sin(phase) * (2.0 * np.pi / nj)
            # synthesis: f = sum_m factor_m (Re fm cos - Im fm sin); modes the
            # ring cannot represent (m >= ceil(nj/2)) are dropped to avoid
            # aliasing energy back onto the short polar rings
            m_ok = (m <= (nj - 1) // 2).astype(np.float32)
            cos_s[j, :, :nj] = (factor * m_ok)[:, None] * np.cos(phase).T
            sin_s[j, :, :nj] = (factor * m_ok)[:, None] * np.sin(phase).T
            off += nj

        plm = associated_legendre(lmax, nodes).astype(np.float32)
        wplm = (plm * weights[None, None, :]).astype(np.float32)
        return cls(
            lmax=lmax, nlat=nlat, n_points=n_points, ring_lengths=rings,
            gather_idx=gather_idx, flat_idx=flat_idx,
            cos_a=cos_a, sin_a=sin_a, cos_s=cos_s, sin_s=sin_s,
            wplm=wplm, plm=plm,
        )

    # -- layout helpers -------------------------------------------------
    def to_rings(self, field: jnp.ndarray) -> jnp.ndarray:
        """[..., n_points] -> padded [..., nlat, Nmax] (pad slots zero)."""
        pad = jnp.concatenate(
            [field, jnp.zeros(field.shape[:-1] + (1,), field.dtype)], axis=-1
        )
        idx = jnp.asarray(self.gather_idx)
        return jnp.take(pad, idx.reshape(-1), axis=-1).reshape(
            field.shape[:-1] + idx.shape
        )

    def from_rings(self, ringed: jnp.ndarray) -> jnp.ndarray:
        """Padded [..., nlat, Nmax] -> flat [..., n_points]."""
        flat = ringed.reshape(ringed.shape[:-2] + (-1,))
        return jnp.take(flat, jnp.asarray(self.flat_idx), axis=-1)

    # -- transforms ------------------------------------------------------
    def analysis(self, field: jnp.ndarray) -> jnp.ndarray:
        """[..., n_points] -> complex coefficients [..., L, M] (m <= l)."""
        ringed = self.to_rings(field)  # [..., nlat, Nmax]
        fm_re = jnp.einsum("...jn,jnm->...jm", ringed, jnp.asarray(self.cos_a))
        fm_im = jnp.einsum("...jn,jnm->...jm", ringed, jnp.asarray(self.sin_a))
        wplm = jnp.asarray(self.wplm)
        re = jnp.einsum("...jm,lmj->...lm", fm_re, wplm)
        im = jnp.einsum("...jm,lmj->...lm", fm_im, wplm)
        return re + 1j * im

    def synthesis(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """coefficients [..., L, M] -> field [..., n_points]."""
        plm = jnp.asarray(self.plm)
        fm_re = jnp.einsum("...lm,lmj->...jm", jnp.real(coeffs), plm)
        fm_im = jnp.einsum("...lm,lmj->...jm", jnp.imag(coeffs), plm)
        ringed = jnp.einsum("...jm,jmn->...jn", fm_re, jnp.asarray(self.cos_s)) - (
            jnp.einsum("...jm,jmn->...jn", fm_im, jnp.asarray(self.sin_s))
        )
        return self.from_rings(ringed)

    def power_spectrum(self, field: jnp.ndarray) -> jnp.ndarray:
        """Per-degree power sum_m |a_lm|^2 (m>0 doubled): [..., lmax+1]."""
        c = self.analysis(field)
        p = jnp.abs(c) ** 2
        p = p.at[..., :, 1:].multiply(2.0)
        return jnp.sum(p, axis=-1)


def fft2(field: jnp.ndarray) -> jnp.ndarray:
    """2-D FFT over the trailing two dims (ref FFT2D :51)."""
    return jnp.fft.fft2(field, axes=(-2, -1))


def ifft2(coeffs: jnp.ndarray) -> jnp.ndarray:
    return jnp.fft.ifft2(coeffs, axes=(-2, -1)).real


def dct2(field: jnp.ndarray) -> jnp.ndarray:
    """2-D type-II DCT via FFT of the even extension (ref DCT2D :188)."""

    def dct1d(x):
        n = x.shape[-1]
        ext = jnp.concatenate([x, jnp.flip(x, axis=-1)], axis=-1)
        spec = jnp.fft.fft(ext, axis=-1)[..., :n]
        phase = jnp.exp(-1j * np.pi * jnp.arange(n) / (2.0 * n))
        return (spec * phase).real

    return dct1d(jnp.swapaxes(dct1d(field), -1, -2)).swapaxes(-1, -2)


def ring_power_spectrum(field: jnp.ndarray, nlat: int, nlon: int) -> jnp.ndarray:
    """Mean zonal power per wavenumber for a regular [..., nlat*nlon] field."""
    f = field.reshape(field.shape[:-1] + (nlat, nlon))
    spec = jnp.abs(jnp.fft.rfft(f, axis=-1)) ** 2
    return jnp.mean(spec, axis=-2)  # average over latitude rings
