"""Spectral losses.

Equivalents of /root/reference/training/src/anemoi/training/losses/spectral.py
(SpectralLoss :88 + variants): penalise differences between the spatial
spectra of prediction and target.  Two families:

- `SphericalSpectralLoss`: spherical-harmonic power spectra on full Gaussian
  grids (GaussianSHT),
- `ZonalSpectralLoss`: per-ring zonal FFT power for regular lat/lon layouts
  (works on any ring-structured grid reshaped to [nlat, nlon]).

Both plug into the ScaleTensor reduction machinery as BaseLoss leaves.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from anemoi_tpu.ops.spectral import GaussianSHT, ring_power_spectrum
from anemoi_tpu.training.losses.base import BaseLoss, loss_registry


@loss_registry.register("ZonalSpectralLoss")
class ZonalSpectralLoss(BaseLoss):
    """MSE between log zonal power spectra (regular [nlat x nlon] grids)."""

    supports_sharding = False  # needs the full rings

    def __init__(self, scalers=None, ignore_nans: bool = True, nlat: int = 0, nlon: int = 0,
                 log_space: bool = True, eps: float = 1e-12):
        super().__init__(scalers, ignore_nans)
        assert nlat > 0 and nlon > 0, "ZonalSpectralLoss needs nlat/nlon of the grid"
        self.nlat = nlat
        self.nlon = nlon
        self.log_space = log_space
        self.eps = eps

    def __call__(self, pred, target, squash: bool = True, **kwargs):
        # [B, T, E, G, V] -> spectra over the grid dim
        pred = jnp.nan_to_num(pred)
        target = jnp.nan_to_num(target)
        p_spec = ring_power_spectrum(jnp.moveaxis(pred, -1, -2), self.nlat, self.nlon)
        t_spec = ring_power_spectrum(jnp.moveaxis(target, -1, -2), self.nlat, self.nlon)
        if self.log_space:
            p_spec = jnp.log(p_spec + self.eps)
            t_spec = jnp.log(t_spec + self.eps)
        err = (p_spec - t_spec) ** 2
        return jnp.mean(err) if squash else jnp.mean(err, axis=tuple(range(err.ndim - 1)))


@loss_registry.register("SphericalSpectralLoss")
class SphericalSpectralLoss(BaseLoss):
    """MSE between per-degree spherical-harmonic power spectra.

    ``grid_kind``: "full" (F<n>, default) | "octahedral" (O<n>) |
    "reduced" (N-style) -- the reduced variants run on the grids the models
    actually use (ref spectral_transforms.py:264,328 ReducedSHT/OctahedralSHT)."""

    supports_sharding = False

    def __init__(self, scalers=None, ignore_nans: bool = True, gaussian_n: int = 0,
                 lmax: Optional[int] = None, log_space: bool = True, eps: float = 1e-12,
                 grid_kind: str = "full"):
        super().__init__(scalers, ignore_nans)
        assert gaussian_n > 0, "SphericalSpectralLoss needs the Gaussian grid n"
        self.grid_kind = grid_kind
        if grid_kind == "full":
            self.sht = GaussianSHT.create(gaussian_n, lmax)
        else:
            from anemoi_tpu.ops.spectral import ReducedSHT

            self.sht = ReducedSHT.create(gaussian_n, lmax, kind=grid_kind)
        self.log_space = log_space
        self.eps = eps

    def __call__(self, pred, target, squash: bool = True, **kwargs):
        def spectra(x):
            x = jnp.nan_to_num(x)
            f = jnp.moveaxis(x, -1, -2)  # [..., V, G]
            if self.grid_kind == "full":
                f = f.reshape(f.shape[:-1] + (self.sht.nlat, self.sht.nlon))
            return self.sht.power_spectrum(f)

        p_spec, t_spec = spectra(pred), spectra(target)
        if self.log_space:
            p_spec = jnp.log(p_spec + self.eps)
            t_spec = jnp.log(t_spec + self.eps)
        err = (p_spec - t_spec) ** 2
        return jnp.mean(err) if squash else jnp.mean(err, axis=tuple(range(err.ndim - 1)))


@loss_registry.register("FourierCorrelationLoss")
class FourierCorrelationLoss(BaseLoss):
    """1 - spectral coherence between pred and target zonal spectra."""

    supports_sharding = False

    def __init__(self, scalers=None, ignore_nans: bool = True, nlat: int = 0, nlon: int = 0,
                 eps: float = 1e-12):
        super().__init__(scalers, ignore_nans)
        self.nlat, self.nlon, self.eps = nlat, nlon, eps

    def __call__(self, pred, target, squash: bool = True, **kwargs):
        pred = jnp.nan_to_num(pred)
        target = jnp.nan_to_num(target)
        shape = pred.shape[:-2] + (pred.shape[-1], self.nlat, self.nlon)
        pf = jnp.fft.rfft(jnp.moveaxis(pred, -1, -2).reshape(shape), axis=-1)
        tf = jnp.fft.rfft(jnp.moveaxis(target, -1, -2).reshape(shape), axis=-1)
        num = jnp.abs(jnp.sum(pf * jnp.conj(tf), axis=(-2, -1)))
        den = jnp.sqrt(
            jnp.sum(jnp.abs(pf) ** 2, axis=(-2, -1))
            * jnp.sum(jnp.abs(tf) ** 2, axis=(-2, -1))
        )
        coherence = num / jnp.maximum(den, self.eps)
        err = 1.0 - coherence
        return jnp.mean(err) if squash else jnp.mean(err, axis=tuple(range(err.ndim - 1)))
