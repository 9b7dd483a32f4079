"""Leaf losses.

Equivalents of the reference's loss leaves
(/root/reference/training/src/anemoi/training/losses/: mse.py, mae.py,
rmse.py, huber.py, logcosh.py, kcrps.py): pointwise errors plugged into the
scaler-weighted reduction of BaseLoss, plus the (almost-fair) kernel CRPS for
ensembles.
"""

from __future__ import annotations


import jax.numpy as jnp

from anemoi_tpu.training.losses.base import BaseLoss, loss_registry


@loss_registry.register("WeightedMSELoss")
class WeightedMSELoss(BaseLoss):
    def error(self, pred, target):
        return (pred - target) ** 2


@loss_registry.register("WeightedMAELoss")
class WeightedMAELoss(BaseLoss):
    def error(self, pred, target):
        return jnp.abs(pred - target)


@loss_registry.register("WeightedRMSELoss")
class WeightedRMSELoss(WeightedMSELoss):
    """sqrt of the weighted MSE (ref rmse.py)."""

    def __call__(self, pred, target, squash: bool = True, **kwargs):
        mse = super().__call__(pred, target, squash=squash, **kwargs)
        return jnp.sqrt(mse)


@loss_registry.register("WeightedHuberLoss")
class WeightedHuberLoss(BaseLoss):
    def __init__(self, scalers=None, ignore_nans: bool = True, delta: float = 1.0):
        super().__init__(scalers, ignore_nans)
        self.delta = delta

    def error(self, pred, target):
        diff = jnp.abs(pred - target)
        quad = jnp.minimum(diff, self.delta)
        return 0.5 * quad**2 + self.delta * (diff - quad)


@loss_registry.register("WeightedLogCoshLoss")
class WeightedLogCoshLoss(BaseLoss):
    def error(self, pred, target):
        # numerically-stable log(cosh(d)) computed on |d|: the naive
        # d + log1p(exp(-2d)) overflows for d << 0 (exp(-2d) -> inf).
        a = jnp.abs(pred - target)
        return a + jnp.log1p(jnp.exp(-2.0 * a)) - jnp.log(2.0)


@loss_registry.register("KernelCRPS")
class KernelCRPS(BaseLoss):
    """(Almost-)fair kernel CRPS over the ensemble dim (ref kcrps.py:28).

    crps = E|X - y| - fair_coef * 0.5 E|X - X'|
    with the pairwise term computed over ensemble members.
    """

    def __init__(self, scalers=None, ignore_nans: bool = True, fair: bool = True):
        super().__init__(scalers, ignore_nans)
        self.fair = fair

    def error(self, pred, target):
        # pred [B,T,M,G,V] over ensemble dim 2; target [B,T,1,G,V]
        # returns [B,T,1,G,V]: the CRPS is already ensemble-reduced, so it
        # broadcasts against the target's NaN mask in the base reduction.
        m = pred.shape[2]
        skill = jnp.mean(jnp.abs(pred - target), axis=2, keepdims=True)
        if m == 1:
            return skill
        # pairwise spread term E|X - X'|
        diff = jnp.abs(pred[:, :, :, None] - pred[:, :, None, :])  # [B,T,M,M,G,V]
        if self.fair:
            spread = jnp.sum(diff, axis=(2, 3)) / (m * (m - 1))
        else:
            spread = jnp.mean(diff, axis=(2, 3))
        return skill - 0.5 * spread[:, :, None]

    def __call__(self, pred, target, squash: bool = True, **kwargs):
        assert target.shape[2] == 1, (
            "KernelCRPS expects a single-truth target with ensemble dim 1, "
            f"got {target.shape}"
        )
        return super().__call__(pred, target, squash=squash, **kwargs)


@loss_registry.register("CombinedLoss")
class CombinedLoss(BaseLoss):
    """Weighted sum of member losses (ref combined.py:28)."""

    def __init__(self, losses, loss_weights=None, scalers=None, ignore_nans: bool = True):
        super().__init__(scalers, ignore_nans)
        from anemoi_tpu.training.losses.base import get_loss_function

        self.members = []
        for cfg in losses:
            if isinstance(cfg, BaseLoss):
                self.members.append(cfg)
            else:
                scaler_dict = {
                    n: (dims, arr) for n, (dims, arr) in (scalers.scalers if scalers else {}).items()
                }
                self.members.append(get_loss_function(dict(cfg), scaler_dict))
        self.weights = list(loss_weights) if loss_weights else [1.0] * len(self.members)

    def __call__(self, pred, target, squash: bool = True, **kwargs):
        total = 0.0
        for w, loss in zip(self.weights, self.members):
            total = total + w * loss(pred, target, squash=squash, **kwargs)
        return total
