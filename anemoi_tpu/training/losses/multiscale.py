"""Multiscale loss wrapper.

Equivalent of /root/reference/training/src/anemoi/training/losses/multiscale.py:35
(MultiscaleLossWrapper): evaluate an inner loss on the native grid AND on
coarsened versions of pred/target, summing with per-scale weights, so the
optimisation sees both small-scale detail and large-scale drift.

Coarsening is a row-normalised sparse projection onto a coarser node set
(grid -> coarse edges from the heterogeneous graph), executed as a
gather + dst-sorted segment-sum — the same scatter-free CSR pattern as
TruncatedConnection (models/layers/residual.py).

Grid-bound scalers (e.g. area weights) are sized for the native grid, so
they are dropped when the inner loss is evaluated at a coarse scale; the
projection is row-normalised, which already equal-weights coarse cells.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from anemoi_tpu.ops.sparse_projector import SparseProjector
from anemoi_tpu.training.losses.base import BaseLoss, ScaleTensor, loss_registry


class _Projection(SparseProjector):
    """Row-normalised sparse projection [.., grid, V] -> [.., coarse, V]
    carrying its per-scale loss weight."""

    def __init__(self, edge_index, weights, num_coarse: int, scale_weight: float):
        super().__init__(edge_index, weights, num_coarse, row_normalize=True)
        self.scale_weight = float(scale_weight)


@loss_registry.register("MultiscaleLossWrapper")
class MultiscaleLossWrapper(BaseLoss):
    """Weighted sum of an inner loss over native + coarsened grids."""

    def __init__(
        self,
        inner: BaseLoss,
        projections: List[_Projection],
        native_weight: float = 1.0,
        grid_scaler_names: Sequence[str] = (),
        scalers: Optional[ScaleTensor] = None,
        ignore_nans: bool = True,
    ):
        super().__init__(scalers=scalers, ignore_nans=ignore_nans)
        self.inner = inner
        self.projections = list(projections)
        self.native_weight = float(native_weight)
        self.grid_scaler_names = list(grid_scaler_names)
        self.supports_sharding = False  # coarse projections need the full grid

    def __call__(
        self,
        pred: jnp.ndarray,  # [B, T, E, G, V]
        target: jnp.ndarray,
        squash: bool = True,
        scaler_subset: Optional[Sequence[str]] = None,
        without_scalers: Optional[Sequence[str]] = None,
    ) -> jnp.ndarray:
        total = 0.0
        norm = 0.0
        if self.native_weight:
            total = self.native_weight * self.inner(
                pred, target, squash=squash,
                scaler_subset=scaler_subset, without_scalers=without_scalers,
            )
            norm += self.native_weight
        skip = set(without_scalers or ()) | set(self.grid_scaler_names)
        for proj in self.projections:
            # NaNs must not smear across a coarse cell: zero-fill invalid
            # targets in BOTH tensors so masked points cancel in the error
            if self.ignore_nans:
                valid = ~jnp.isnan(target)
                p = jnp.where(valid, pred, 0.0)
                t = jnp.where(valid, target, 0.0)
            else:
                p, t = pred, target
            total = total + proj.scale_weight * self.inner(
                proj(p), proj(t), squash=squash,
                scaler_subset=scaler_subset, without_scalers=sorted(skip),
            )
            norm += proj.scale_weight
        return total / max(norm, 1e-12)

    @property
    def name(self) -> str:
        return f"multiscale_{self.inner.name}"


def build_multiscale_loss(
    config: dict,
    scalers=None,
    graph=None,
    dataset: str = "data",
) -> MultiscaleLossWrapper:
    """Build from config + the heterogeneous graph.

    config = {"name": "MultiscaleLossWrapper",
              "loss": {<inner loss config>},
              "native_weight": 1.0,
              "scales": [{"nodes": "coarse", "weight": 0.5,
                          "weight_attribute": "gauss_weight"}, ...]}

    Each scale's projection uses the (dataset -> nodes) edge set of the
    graph (dst-sorted by post-processing).  Grid-dim scalers are detected
    from the pre-built scaler dict (dims containing "grid") and dropped at
    coarse scales.
    """
    from anemoi_tpu.training.losses.base import get_loss_function

    cfg = dict(config)
    cfg.pop("name", None)
    inner = get_loss_function(cfg.pop("loss", {"name": "WeightedMSELoss"}), scalers)
    grid_names = [
        n for n, (dims, _a) in (scalers or {}).items() if "grid" in tuple(dims)
    ]
    projections = []
    for sc in cfg.pop("scales", []):
        if "edge_index" in sc:  # direct-array form (tests, custom pipelines)
            projections.append(
                _Projection(
                    sc["edge_index"], sc["weights"], int(sc["num_coarse"]),
                    sc.get("weight", 1.0),
                )
            )
            continue
        assert graph is not None, "MultiscaleLossWrapper scales need the graph"
        nodes = sc["nodes"]
        es = graph[(dataset, nodes)]
        attr = sc.get("weight_attribute")
        w = (
            es.attributes[attr].reshape(-1)
            if attr
            else np.ones(es.edge_index.shape[1], np.float32)
        )
        projections.append(
            _Projection(es.edge_index, w, graph[nodes].num_nodes, sc.get("weight", 1.0))
        )
    return MultiscaleLossWrapper(
        inner=inner,
        projections=projections,
        native_weight=float(cfg.pop("native_weight", 1.0)),
        grid_scaler_names=grid_names,
        ignore_nans=bool(cfg.pop("ignore_nans", True)),
    )
