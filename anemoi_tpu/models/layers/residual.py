"""Residual connections between input state and predicted output.

Equivalents of /root/reference/models/src/anemoi/models/layers/residual.py:
- SkipConnection (:60): pass the most recent input timestep forward
- NoResidualConnection: zeros (pure tendency prediction)
- TruncatedConnection (:84): spectral truncation via sparse down/up projection
  over truncation graphs (round-2: needs the projection graph builder)

All operate on x of shape [batch, time, ensemble, grid, vars] and return the
skip state shaped [batch, n_step_output, ensemble, grid, vars].
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from anemoi_tpu.utils.registry import Registry

residual_registry = Registry("residual connection")


def _expand_time(x_skip: jnp.ndarray, n_step_output: int) -> jnp.ndarray:
    # x_skip: [batch, ens, grid, vars] -> [batch, n_step_output, ens, grid, vars]
    return jnp.broadcast_to(
        x_skip[:, None], (x_skip.shape[0], n_step_output) + x_skip.shape[1:]
    )


@residual_registry.register("SkipConnection")
class SkipConnection:
    """Return the input's timestep ``step`` (default: most recent)."""

    def __init__(self, step: int = -1, **_):
        self.step = step

    def __call__(self, x: jnp.ndarray, n_step_output: int = 1) -> jnp.ndarray:
        return _expand_time(x[:, self.step], n_step_output)


@residual_registry.register("NoResidualConnection")
class NoResidualConnection:
    """Zero skip: the decoder output is the full state (or a tendency handled
    by the task)."""

    def __init__(self, **_):
        pass

    def __call__(self, x: jnp.ndarray, n_step_output: int = 1) -> jnp.ndarray:
        return jnp.zeros_like(_expand_time(x[:, -1], n_step_output))


@residual_registry.register("TruncatedConnection")
class TruncatedConnection:
    """Truncate high-frequency content of the skip state by projecting the
    grid field down to a coarse node set and back (ref residual.py:84-341).

    Projections are CSR-style sparse matmuls executed as segment-sums; the
    (down, up) matrices come from edge weights of two truncation subgraphs.
    """

    def __init__(
        self,
        down_edge_index,
        down_weights,
        up_edge_index,
        up_weights,
        num_coarse: int,
        num_data: int,
        step: int = -1,
        row_normalize: bool = True,
        **_,
    ):
        import numpy as np

        def prep(edge_index, weights, num_dst):
            ei = np.asarray(edge_index)
            w = np.asarray(weights, dtype=np.float32).reshape(-1)
            if row_normalize:
                sums = np.zeros(num_dst, dtype=np.float64)
                np.add.at(sums, ei[1], w)
                w = (w / np.maximum(sums[ei[1]], 1e-12)).astype(np.float32)
            return jnp.asarray(ei), jnp.asarray(w)

        self.down_ei, self.down_w = prep(down_edge_index, down_weights, num_coarse)
        self.up_ei, self.up_w = prep(up_edge_index, up_weights, num_data)
        self.num_coarse = num_coarse
        self.num_data = num_data
        self.step = step

    def _project(self, x: jnp.ndarray, ei, w, num_dst: int) -> jnp.ndarray:
        import jax

        # x: [..., grid, vars] -> gather src rows, weight, scatter to dst
        src, dst = ei[0], ei[1]
        gathered = jnp.take(x, src, axis=-2) * w[:, None]
        return jax.ops.segment_sum(
            jnp.moveaxis(gathered, -2, 0),
            dst,
            num_segments=num_dst,
            indices_are_sorted=True,
        ).swapaxes(0, -2) if x.ndim > 2 else jax.ops.segment_sum(
            gathered, dst, num_segments=num_dst, indices_are_sorted=True
        )

    def __call__(self, x: jnp.ndarray, n_step_output: int = 1) -> jnp.ndarray:
        x_skip = x[:, self.step]  # [batch, ens, grid, vars]
        shape = x_skip.shape
        flat = x_skip.reshape(-1, shape[-2], shape[-1])
        import jax

        def proj(sample):
            coarse = self._project(sample, self.down_ei, self.down_w, self.num_coarse)
            return self._project(coarse, self.up_ei, self.up_w, self.num_data)

        out = jax.vmap(proj)(flat).reshape(shape)
        return _expand_time(out, n_step_output)


def build_residual(config: Optional[dict], graph=None, dataset: str = "data", **kwargs):
    """Build a residual connection; TruncatedConnection resolves its down/up
    projection sub-graphs from the heterogeneous graph (the reference's
    ProjectionCreator path, residual.py:84 + graph_provider.py:464)."""
    if config is None:
        return SkipConnection()
    cfg = dict(config)
    if cfg.get("name") == "TruncatedConnection" and "down_edge_index" not in cfg:
        assert graph is not None, "TruncatedConnection needs the source graph"
        trunc = cfg.pop("truncation_nodes", "truncation")
        weight_attr = cfg.pop("edge_weight_attribute", "gauss_weight")
        down = graph[(dataset, trunc)]
        up = graph[(trunc, dataset)]
        cfg.update(
            down_edge_index=down.edge_index,
            down_weights=down.attributes[weight_attr],
            up_edge_index=up.edge_index,
            up_weights=up.attributes[weight_attr],
            num_coarse=graph[trunc].num_nodes,
            num_data=graph[dataset].num_nodes,
        )
    return residual_registry.build_from_config(cfg, **kwargs)
