"""Runtime (in-jit) graph construction: dynamic kNN edges + scatter-free tables.

TPU-native equivalent of the reference's DynamicGraphProvider hook
(/root/reference/models/src/anemoi/models/layers/graph_provider.py:341-461):
edges are (re)computed from node coordinates INSIDE the jitted step, e.g. for
observation streams or adaptive meshes whose geometry changes per batch.

The reference leaves ``build_graph`` unimplemented; here the full path exists
and stays scatter-free end to end:

- kNN on the unit sphere is one dense ``dst_xyz @ src_xyz.T`` (MXU) +
  ``lax.top_k`` -- nearest-by-inner-product == nearest-by-great-circle.
- The backward transpose tables (normally precomputed on the host,
  ops/padded.py) are built at trace time from a single ``argsort`` over edge
  sources + ``searchsorted`` offsets: pure sort/gather ops, no scatter in the
  program, so the result feeds the existing ``padded_gt_attention_flat``
  custom VJP unchanged.
- Edge attributes (EdgeDirection, EdgeLength -- the standard mapper pair,
  graphs/edges.py:139-157) are recomputed in jnp with the same formulas and
  the same global normalisations as the host builders.

``k_out`` bounds each source's out-degree in the transpose table; out-edges
beyond it would silently drop gradient contributions, so callers must choose
``k_out >= max out-degree`` (for kNN graphs ``4 * k * ceil(Nd/Ns)`` is a safe
default, validated in tests via ``check_out_degree``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from anemoi_tpu.ops.padded import PaddedTables


def xyz_from_sincos(feat: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] (sin lat, sin lon, cos lat, cos lon) node features (the model's
    graph_inputs["node_features"], models/layers/embed.py:17) -> unit xyz."""
    sin_lat, sin_lon, cos_lat, cos_lon = (feat[:, i] for i in range(4))
    return jnp.stack(
        [cos_lat * cos_lon, cos_lat * sin_lon, sin_lat], axis=-1
    )


def latlon_from_sincos(feat: jnp.ndarray) -> jnp.ndarray:
    sin_lat, sin_lon, cos_lat, cos_lon = (feat[:, i] for i in range(4))
    return jnp.stack(
        [jnp.arctan2(sin_lat, cos_lat), jnp.arctan2(sin_lon, cos_lon)], axis=-1
    )


def _great_circle(a_latlon: jnp.ndarray, b_latlon: jnp.ndarray) -> jnp.ndarray:
    """Haversine arc length (graphs/transforms.py:35, jnp)."""
    lat1, lon1 = a_latlon[..., 0], a_latlon[..., 1]
    lat2, lon2 = b_latlon[..., 0], b_latlon[..., 1]
    h = (
        jnp.sin((lat2 - lat1) / 2.0) ** 2
        + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin((lon2 - lon1) / 2.0) ** 2
    )
    return 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(h, 0.0, 1.0)))


def _edge_directions(src_latlon: jnp.ndarray, dst_latlon: jnp.ndarray) -> jnp.ndarray:
    """Source position in the destination-centred frame (graphs/transforms.py:45)."""
    lat_d, lon_d = dst_latlon[..., 0], dst_latlon[..., 1]
    lat_s, lon_s = src_latlon[..., 0], src_latlon[..., 1]
    clat = jnp.cos(lat_s)
    x, y, z = clat * jnp.cos(lon_s), clat * jnp.sin(lon_s), jnp.sin(lat_s)
    cos_l, sin_l = jnp.cos(-lon_d), jnp.sin(-lon_d)
    x1 = cos_l * x - sin_l * y
    y1 = sin_l * x + cos_l * y
    cos_p, sin_p = jnp.cos(-lat_d), jnp.sin(-lat_d)
    x2 = cos_p * x1 + sin_p * z
    z2 = -sin_p * x1 + cos_p * z
    norm = jnp.sqrt(jnp.clip(x2**2 + y1**2 + z2**2, 1e-24, None))
    lat = jnp.arcsin(jnp.clip(z2 / norm, -1.0, 1.0))
    lon = jnp.arctan2(y1, x2)
    return jnp.stack([lat, lon], axis=-1)


def runtime_knn_tables(
    src_feat: jnp.ndarray,  # [Ns, 4] sincos features
    dst_feat: jnp.ndarray,  # [Nd, 4]
    k: int,
    k_out: int,
) -> PaddedTables:
    """Build the full scatter-free attention table set for the kNN graph of
    each destination's ``k`` nearest sources, at trace time.

    Edge (dst, j) occupies flat slot ``dst * k + j`` -- i.e. the edge set is
    dst-sorted by construction (the framework CSR invariant)."""
    ns = src_feat.shape[0]
    nd = dst_feat.shape[0]
    sim = jnp.dot(
        xyz_from_sincos(dst_feat), xyz_from_sincos(src_feat).T,
        preferred_element_type=jnp.float32,
    )  # [Nd, Ns]; maximising inner product == minimising great-circle
    _, idx = jax.lax.top_k(sim, k)  # [Nd, k]

    num_edges = nd * k
    edge_src = idx.reshape(-1).astype(jnp.int32)  # [E]
    edge_dst = jnp.repeat(jnp.arange(nd, dtype=jnp.int32), k)
    flat_slots = jnp.arange(num_edges, dtype=jnp.int32)

    # src-side transpose table via one sort over edge sources (no scatter):
    # order edges by src, then each source's out-edges are the contiguous run
    # [start[s], start[s] + deg[s]) of the sorted slot list.
    order = jnp.argsort(edge_src)
    src_sorted = edge_src[order]
    slots_sorted = flat_slots[order]
    start = jnp.searchsorted(src_sorted, jnp.arange(ns, dtype=jnp.int32))
    end = jnp.searchsorted(
        src_sorted, jnp.arange(ns, dtype=jnp.int32), side="right"
    )
    deg = end - start  # [Ns]
    j = jnp.arange(k_out, dtype=jnp.int32)
    gather_pos = jnp.clip(start[:, None] + j[None, :], 0, num_edges - 1)
    valid = j[None, :] < deg[:, None]  # [Ns, k_out]
    src_gather_slots = jnp.where(
        valid, jnp.take(slots_sorted, gather_pos.reshape(-1), axis=0).reshape(ns, k_out),
        num_edges,
    ).astype(jnp.int32)

    return PaddedTables(
        src_slots=idx.astype(jnp.int32),
        edge_slots=flat_slots.reshape(nd, k),
        mask=jnp.ones((nd, k), dtype=bool),
        src_gather_slots=src_gather_slots,
        src_gather_mask=valid,
        edge_gather_slot=flat_slots,
        edge_dst=edge_dst,
        edge_src=edge_src,
    )


def check_out_degree(tables: PaddedTables, k_out: int) -> jnp.ndarray:
    """Max out-degree of the runtime graph (host-side sanity: must be
    <= ``k_out`` or the transpose table drops gradient contributions)."""
    counts = jnp.sum(tables.src_gather_mask, axis=1)
    return jnp.max(counts)


def runtime_edge_attributes(
    src_feat: jnp.ndarray,
    dst_feat: jnp.ndarray,
    tables: PaddedTables,
    attributes: Tuple[str, ...] = ("edge_dirs", "edge_length"),
) -> jnp.ndarray:
    """EdgeDirection (unit-std) and/or EdgeLength (unit-max) for the runtime
    edge set, matching the host builders (graphs/edges.py:139-157) exactly
    (same formulas, same global normalisations over the edge set)."""
    src_ll = latlon_from_sincos(src_feat)
    dst_ll = latlon_from_sincos(dst_feat)
    s = jnp.take(src_ll, tables.edge_src, axis=0)
    d = jnp.take(dst_ll, tables.edge_dst, axis=0)
    feats = []
    for name in attributes:
        if name == "edge_dirs":
            dirs = _edge_directions(s, d)  # [E, 2]
            std = jnp.std(dirs)
            feats.append(dirs / jnp.where(std == 0, 1.0, std))
        elif name == "edge_length":
            length = _great_circle(s, d)[:, None]  # [E, 1]
            feats.append(length / jnp.clip(jnp.max(length), 1e-12, None))
        else:
            raise ValueError(f"unsupported runtime edge attribute '{name}'")
    return jnp.concatenate(feats, axis=-1)
