"""Static model-side view of a Graph.

Equivalent of the reference's graph providers
(/root/reference/models/src/anemoi/models/layers/graph_provider.py:145
StaticGraphProvider): extract, per sub-graph, the dst-sorted edge index and the
selected edge-attribute matrix as plain numpy, ready to be closed over by the
jitted forward (they become XLA constants -- the graph is static).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from anemoi_tpu.graphs.graph import Graph
from anemoi_tpu.models.layers.embed import sincos_coordinates
from anemoi_tpu.ops.padded import PaddedCSR


@struct.dataclass
class EdgeData:
    """Device-side edge arrays for one sub-graph, passed through the model as
    a pytree (jit/remat-friendly).  ``tables`` holds the padded-CSR forward +
    transpose tables (None when using the segment backend only); when the dst
    set is degree-sorted, ``bucket_tables``/``bucket_spans`` additionally hold
    the degree-bucketed variant (~2x less gather padding on skewed meshes)."""

    edge_attr: jnp.ndarray  # [E, F]  ([S, E_loc, F] once permuted for halo)
    edge_index: jnp.ndarray  # [2, E] dst-sorted
    tables: Optional[object] = None  # PaddedTables pytree
    bucket_tables: Optional[tuple] = None  # tuple of PaddedTables
    bucket_spans: Optional[tuple] = struct.field(pytree_node=False, default=None)
    src_range_tables: Optional[tuple] = None  # per-src-range (slots, mask)
    src_range_spans: Optional[tuple] = struct.field(pytree_node=False, default=None)
    src_range_perm: Optional[jnp.ndarray] = None  # [Ns] natural->sorted row
    # model-parallel "edges" (halo) strategy: stacked per-shard tables with a
    # leading [S] axis (see parallel/partition.py) + the edge permutation into
    # the per-shard slot layout (gather-only in both directions)
    halo_tables: Optional[dict] = None
    edge_perm: Optional[jnp.ndarray] = None  # [S, E_loc] global edge id (pad=E)
    edge_perm_inv: Optional[jnp.ndarray] = None  # [E] flat per-shard slot
    # paged kernel inside the halo shard_map: (bd, page, r) static meta for
    # the pg_* tables carried in halo_tables
    halo_paged_meta: Optional[tuple] = struct.field(pytree_node=False, default=None)
    # fused paged Pallas kernel (ops/pallas/paged_gt.py): slot tables built on
    # a space-filling-curve node order; edge_attr stays canonical -- the
    # runtime slot-layout transform is a gather pair inside the op
    paged_tables: Optional[object] = None  # PagedTables pytree
    # STATIC edge attrs pre-gathered into the kernel slot layout at build
    # time: the in-step [E, F] -> [num_flat, F] narrow-lane gather is slow
    # on chip (~9 ms/step for the n320 decoder alone) and pure table math.
    # Blocks use it only when their (possibly trainable-augmented) edge
    # width still matches -- TrainableEdgeFeatures widen and so fall back
    edge_attr_slots: Optional[jnp.ndarray] = None  # [num_flat, F]

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])


# ``edge_attr_slots`` is a build-time SNAPSHOT of edge_attr in the paged-kernel
# slot layout: any runtime replacement of edge_attr invalidates it, so clear it
# unless the caller explicitly supplies a matching slot tensor.  (flax's
# struct.dataclass overwrites methods defined in the class body, hence the
# post-hoc wrap.)
_edge_data_replace = EdgeData.replace


def _replace_clearing_stale_slots(self, **updates):
    if (
        "edge_attr" in updates
        and "edge_attr_slots" not in updates
        # identity re-assignment (e.g. TrainableEdgeFeatures with size 0
        # returning its input) is not a modification: keep the build-time
        # slots -- clearing them re-runs the in-step slot gather (~1.4 ms
        # at o96, ~9 ms-class for the n320 decoder)
        and updates["edge_attr"] is not self.edge_attr
    ):
        updates["edge_attr_slots"] = None
    return _edge_data_replace(self, **updates)


EdgeData.replace = _replace_clearing_stale_slots


@dataclass
class SubGraphArrays:
    """One directed sub-graph's static arrays (host-side)."""

    edge_index: np.ndarray  # [2, E] int32, dst-sorted
    edge_attr: np.ndarray  # [E, F] float32
    dst_ptr: np.ndarray  # [num_dst+1] CSR pointer
    num_src: int
    num_dst: int
    _csr: Optional[PaddedCSR] = None

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    @property
    def edge_dim(self) -> int:
        return int(self.edge_attr.shape[1])

    @property
    def padded_csr(self) -> PaddedCSR:
        if self._csr is None:
            self._csr = PaddedCSR.from_edge_index(
                self.edge_index, self.dst_ptr, num_src=self.num_src
            )
        return self._csr

    def edge_data(
        self, dtype=jnp.float32, padded: bool = True, bucketed: bool = False,
        k_multiple: int = 1, paged: bool = False,
        paged_block: tuple = (256, 256, 128), paged_fused_bwd: bool = False,
    ) -> EdgeData:
        """Device-ready EdgeData (padded tables included unless disabled;
        ``bucketed`` adds degree-bucketed tables for the GT attention path).

        ``k_multiple``: rounding for the per-bucket k.  Exact (1) minimises
        gather volume; 8 keeps the [n, k, HD] reshape around the k-reduction
        tile-aligned (free) -- worth it for the processor sub-graph, whose
        reshapes run 16 layers x fwd+bwd per step."""
        from anemoi_tpu.ops.padded import PaddedTables, build_bucketed_tables

        tables = PaddedTables.from_csr(self.padded_csr) if padded else None
        bucket_tables = bucket_spans = src_tables = src_spans = src_rank = None
        if padded and bucketed:
            bucket_tables, bucket_spans, src_tables, src_spans, src_rank = (
                build_bucketed_tables(
                    self.edge_index, self.dst_ptr, num_src=self.num_src,
                    k_multiple=k_multiple, sort_src_by_out_degree=True,
                )
            )
            # keep the bucketed path if EITHER side wins: >1 dst bucket, or
            # src ranges that beat the plain full-width k_out reduction (e.g.
            # a KNN decoder: 1 dst bucket but 3.7x src-side padding waste)
            plain_bwd_rows = self.num_src * (
                tables.src_gather_slots.shape[1] if tables is not None else 0
            )
            range_bwd_rows = sum((hi - lo) * k for lo, hi, k in src_spans)
            if len(bucket_tables) <= 1 and range_bwd_rows >= plain_bwd_rows:
                bucket_tables = bucket_spans = src_tables = src_spans = None
                src_rank = None
        paged_tables = None
        edge_attr_slots = None
        if paged:
            from anemoi_tpu.ops.pallas.paged_gt import (
                PagedTables, build_paged_csr, to_slot_layout,
            )

            bd, page, r = paged_block
            csr = build_paged_csr(
                self.edge_index, self.num_src, self.num_dst,
                bd=bd, page=page, r=r,
            )
            paged_tables = PagedTables.from_csr(csr, fused_bwd=paged_fused_bwd)
            edge_attr_slots = to_slot_layout(
                jnp.asarray(self.edge_attr, dtype=dtype),
                paged_tables.slot_gather, paged_tables.edge_slot,
            )
        return EdgeData(
            edge_attr=jnp.asarray(self.edge_attr, dtype=dtype),
            edge_attr_slots=edge_attr_slots,
            edge_index=jnp.asarray(self.edge_index),
            tables=tables,
            bucket_tables=bucket_tables,
            bucket_spans=bucket_spans,
            src_range_tables=src_tables,
            src_range_spans=src_spans,
            src_range_perm=src_rank,
            paged_tables=paged_tables,
        )

    def sharded_edge_data(
        self, n_shards: int, dtype=jnp.float32, paged: bool = False,
        paged_block: tuple = (256, 256, 128), overlap: bool = True,
    ) -> EdgeData:
        """EdgeData for the model-parallel "edges" (halo-exchange) strategy:
        partition this sub-graph across ``n_shards`` contiguous node shards,
        build the stacked per-shard attention + halo send/recv tables
        (parallel/partition.py), and the edge permutation into the per-shard
        layout.  Bipartite mapper graphs partition src and dst independently
        (the halo exchange then rides the src partition).  Reference
        equivalent: the cached HaloInfo of
        /root/reference/models/src/anemoi/models/layers/block.py:1103-1146."""
        from anemoi_tpu.parallel.halo import shard_tables
        from anemoi_tpu.parallel.partition import partition_graph

        sg = partition_graph(
            self.edge_index.astype(np.int64),
            self.dst_ptr.astype(np.int64),
            self.num_dst,
            n_shards,
            halo=True,
            num_src_nodes=self.num_src if self.num_src != self.num_dst else None,
        )
        num_src_ext = sg.n_local_src + n_shards * sg.h_pair
        tables = dict(shard_tables(sg, num_src_ext))
        if overlap:
            # interior/boundary destination split so the per-layer halo
            # all_to_all overlaps with the interior attention compute
            # (parallel/halo.py, VERDICT r2 item 6)
            from anemoi_tpu.parallel.halo import shard_split_tables

            tables.update(shard_split_tables(sg, num_src_ext))
        halo_paged_meta = None
        if paged:
            from anemoi_tpu.parallel.halo import (
                shard_paged_tables,
                shard_split_paged_tables,
            )

            bd, page, r = paged_block
            if overlap:
                pg_tables, halo_paged_meta = shard_split_paged_tables(
                    sg, num_src_ext, bd=bd, page=page, r=r
                )
            else:
                pg_tables, halo_paged_meta = shard_paged_tables(
                    sg, num_src_ext, bd=bd, page=page, r=r
                )
            tables.update(pg_tables)
        S, e_loc = sg.edge_attr_perm.shape
        inv = np.zeros(self.num_edges, dtype=np.int32)
        flat_slots = np.arange(S * e_loc, dtype=np.int32).reshape(S, e_loc)
        inv[sg.edge_attr_perm[sg.edge_pad_mask]] = flat_slots[sg.edge_pad_mask]
        return EdgeData(
            edge_attr=jnp.asarray(self.edge_attr, dtype=dtype),
            edge_index=jnp.asarray(self.edge_index),
            halo_tables=tables,
            edge_perm=jnp.asarray(sg.edge_attr_perm),
            edge_perm_inv=jnp.asarray(inv),
            halo_paged_meta=halo_paged_meta,
        )


@dataclass
class ModelGraph:
    """Everything the model needs from the heterogeneous graph."""

    node_features: Dict[str, np.ndarray]  # name -> [N, 4] sincos lat/lon
    num_nodes: Dict[str, int]
    encoder: Dict[str, SubGraphArrays]  # dataset name -> (data -> hidden)
    processor: SubGraphArrays  # hidden -> hidden
    decoder: Dict[str, SubGraphArrays]  # dataset name -> (hidden -> data)
    hidden_name: str = "hidden"
    dataset_names: List[str] = field(default_factory=list)
    source_graph: Optional[Graph] = None  # host-side, for hierarchy subgraphs


def extract_subgraph(
    graph: Graph, src: str, dst: str, edge_attributes: Optional[List[str]] = None
) -> SubGraphArrays:
    es = graph[(src, dst)]
    assert es.is_dst_sorted, f"edges {src}->{dst} must be dst-sorted (run post-processing)"
    return SubGraphArrays(
        edge_index=es.edge_index.astype(np.int32),
        edge_attr=es.attribute_matrix(edge_attributes),
        dst_ptr=es.dst_ptr.astype(np.int32),
        num_src=graph[src].num_nodes,
        num_dst=graph[dst].num_nodes,
    )


def build_model_graph(
    graph: Graph,
    dataset_names: Optional[List[str]] = None,
    hidden_name: str = "hidden",
    encoder_edge_attributes: Optional[List[str]] = None,
    processor_edge_attributes: Optional[List[str]] = None,
    decoder_edge_attributes: Optional[List[str]] = None,
) -> ModelGraph:
    if dataset_names is None:
        dataset_names = [
            n for n in graph.node_names() if n != hidden_name and not n.startswith("hidden")
        ]
    node_features = {
        name: sincos_coordinates(graph[name].coords) for name in graph.node_names()
    }
    num_nodes = {name: graph[name].num_nodes for name in graph.node_names()}
    encoder = {
        ds: extract_subgraph(graph, ds, hidden_name, encoder_edge_attributes)
        for ds in dataset_names
    }
    decoder = {
        ds: extract_subgraph(graph, hidden_name, ds, decoder_edge_attributes)
        for ds in dataset_names
    }
    if (hidden_name, hidden_name) in graph.edges:
        processor = extract_subgraph(
            graph, hidden_name, hidden_name, processor_edge_attributes
        )
    else:
        # encoder-decoder-only graphs (autoencoders / point-wise processors,
        # ref graph/encoder_decoder_only.yaml + NoOpGraphProvider): empty
        # processor sub-graph with a consistent attribute width
        n_hidden = graph[hidden_name].num_nodes
        n_attr = len(processor_edge_attributes or []) or 1
        processor = SubGraphArrays(
            edge_index=np.zeros((2, 0), dtype=np.int32),
            edge_attr=np.zeros((0, n_attr), dtype=np.float32),
            dst_ptr=np.zeros(n_hidden + 1, dtype=np.int32),
            num_src=n_hidden,
            num_dst=n_hidden,
        )
    return ModelGraph(
        node_features=node_features,
        num_nodes=num_nodes,
        encoder=encoder,
        processor=processor,
        decoder=decoder,
        hidden_name=hidden_name,
        dataset_names=list(dataset_names),
        source_graph=graph,
    )
