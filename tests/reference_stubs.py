"""Minimal stand-ins for torch_geometric / anemoi.utils so the REFERENCE's
own torch modules (/root/reference/models/src) can execute on this image for
parity testing (torch_geometric is not installed; anemoi.utils is a separate
package not vendored in the reference checkout).

Only the surface the reference's "pyg" graph-attention path touches is
implemented: typing aliases, segment ``softmax``/``scatter`` utilities, and a
reflection-based ``MessagePassing.propagate`` that gathers ``*_i``/``*_j``
arguments by edge endpoint and sum-aggregates messages by destination --
the contract of conv.py:83-147 (GraphTransformerConv) and :66-81 (GraphConv).
"""

from __future__ import annotations

import inspect
import sys
import types
from typing import Any, Optional, Tuple, Union

import torch

REFERENCE_MODELS_SRC = "/root/reference/models/src"
REFERENCE_GRAPHS_SRC = "/root/reference/graphs/src"


def _scatter(src, index, dim=0, dim_size=None, reduce="sum"):
    assert dim == 0
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype, device=src.device)
    idx = index.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    if reduce in ("sum", "add"):
        return out.scatter_add(0, idx, src)
    raise NotImplementedError(reduce)


def _segment_softmax(src, index, ptr=None, num_nodes=None):
    """Per-destination-segment softmax (torch_geometric.utils.softmax)."""
    n = num_nodes if num_nodes is not None else int(index.max()) + 1
    seg_max = torch.full((n,) + src.shape[1:], float("-inf"), dtype=src.dtype)
    idx = index.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    seg_max = seg_max.scatter_reduce(0, idx, src, reduce="amax", include_self=True)
    ex = torch.exp(src - seg_max.gather(0, idx))
    denom = _scatter(ex, index, dim=0, dim_size=n, reduce="sum")
    return ex / denom.gather(0, idx).clamp_min(1e-16)


class _MessagePassing(torch.nn.Module):
    """Reflection-based propagate: enough for the reference conv classes."""

    def __init__(self, aggr: str = "add", node_dim: int = 0, **kwargs):
        super().__init__()
        self.aggr = aggr
        self.node_dim = node_dim
        self.training = True

    def propagate(self, edge_index, size=None, dim_size=None, **kwargs):
        src, dst = edge_index[0], edge_index[1]
        collected = {}
        for name, param in inspect.signature(self.message).parameters.items():
            if name in ("size_i", "size_j"):
                collected[name] = dim_size
            elif name.endswith("_i") or name.endswith("_j"):
                base = name[:-2]
                val = kwargs[base]
                if isinstance(val, tuple):
                    val = val[1] if name.endswith("_i") else val[0]
                idx = dst if name.endswith("_i") else src
                collected[name] = val.index_select(0, idx)
            elif name == "index":
                collected[name] = dst
            elif name == "ptr":
                collected[name] = None
            elif name in kwargs:
                collected[name] = kwargs[name]
            elif param.default is not inspect.Parameter.empty:
                collected[name] = param.default
        msg = self.message(**collected)

        agg_params = inspect.signature(self.aggregate).parameters
        agg_kwargs = {}
        if "edge_index" in agg_params:
            agg_kwargs["edge_index"] = edge_index
        if "index" in agg_params:
            agg_kwargs["index"] = dst
        if "dim_size" in agg_params:
            agg_kwargs["dim_size"] = dim_size
        return self.aggregate(msg, **agg_kwargs)

    def aggregate(self, msg, index=None, dim_size=None):
        return _scatter(msg, index, dim=0, dim_size=dim_size, reduce="sum")


class _DotDict(dict):
    """anemoi.utils.config.DotDict: dict with attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _dotify(obj):
    """Recursively wrap dicts as _DotDicts (nested config access)."""
    if isinstance(obj, dict):
        return _DotDict({k: _dotify(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return [_dotify(v) for v in obj]
    return obj


class _NodeStore(types.SimpleNamespace):
    def __getattr__(self, k):  # only called when the attribute is missing
        if k == "num_nodes":
            return int(self.__dict__["x"].shape[0])
        raise AttributeError(k)


class _EdgeStore(types.SimpleNamespace):
    """Edge store: attribute access (.edge_index) + name subscript for edge
    attributes, the surface StaticGraphProvider reads (graph_provider.py:239)."""

    def __getitem__(self, key):
        return getattr(self, key)

    def __bool__(self):
        return True


class _HeteroData:
    """Just enough of torch_geometric.data.HeteroData for the reference
    models: node/edge stores keyed by name / (src, 'to', dst)."""

    def __init__(self):
        self._nodes = {}
        self._edges = {}

    def __getitem__(self, key):
        if isinstance(key, str):
            return self._nodes.setdefault(key, _NodeStore())
        if isinstance(key, tuple):
            if len(key) == 3:
                key = (key[0], key[2])
            return self._edges.setdefault(key, _EdgeStore())
        raise KeyError(key)

    def __contains__(self, key):
        if isinstance(key, tuple) and len(key) == 3:
            key = (key[0], key[2])
        return key in self._nodes or key in self._edges

    @property
    def node_types(self):
        return list(self._nodes)

    @property
    def edge_types(self):
        return [(s, "to", d) for s, d in self._edges]

    def node_items(self):
        return list(self._nodes.items())


def install() -> None:
    """Install the stub modules and put the reference source on sys.path."""
    for p in (REFERENCE_MODELS_SRC, REFERENCE_GRAPHS_SRC):
        if p not in sys.path:
            sys.path.insert(0, p)

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.DictConfig = _DotDict
        oc.ListConfig = list

        class OmegaConf:
            @staticmethod
            def to_container(x, resolve=True):
                def conv(v):
                    if isinstance(v, dict):
                        return {k: conv(u) for k, u in v.items()}
                    if isinstance(v, (list, tuple)):
                        return [conv(u) for u in v]
                    return v

                return conv(x)

            @staticmethod
            def create(x=None):
                return _dotify(x or {})

        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = oc

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        typing_mod = types.ModuleType("torch_geometric.typing")
        typing_mod.Adj = Any
        typing_mod.OptTensor = Optional[torch.Tensor]
        typing_mod.OptPairTensor = Union[torch.Tensor, Tuple[torch.Tensor, torch.Tensor]]
        typing_mod.PairTensor = Tuple[torch.Tensor, torch.Tensor]
        typing_mod.Size = Optional[Tuple[int, int]]
        utils_mod = types.ModuleType("torch_geometric.utils")
        utils_mod.scatter = _scatter
        utils_mod.softmax = _segment_softmax
        utils_mod.degree = lambda index, num_nodes=None, dtype=None: torch.bincount(
            index, minlength=num_nodes or 0
        ).to(dtype or torch.long)
        utils_mod.index_sort = lambda inputs, max_value=None, stable=True: (
            lambda s: (s.values, s.indices)
        )(torch.sort(inputs, stable=stable))

        def _not_needed(*a, **k):  # k-hop partition helpers: not used when
            raise NotImplementedError  # model_comm_group is None

        utils_mod.bipartite_subgraph = _not_needed
        utils_mod.k_hop_subgraph = _not_needed
        utils_mod.mask_to_index = _not_needed
        sparse_mod = types.ModuleType("torch_geometric.utils.sparse")

        def index2ptr(index, size=None):
            size = size if size is not None else (int(index.max()) + 1 if index.numel() else 0)
            return torch.searchsorted(
                index, torch.arange(size + 1, device=index.device)
            )

        sparse_mod.index2ptr = index2ptr
        utils_mod.sparse = sparse_mod
        nn_mod = types.ModuleType("torch_geometric.nn")
        conv_mod = types.ModuleType("torch_geometric.nn.conv")
        conv_mod.MessagePassing = _MessagePassing
        nn_mod.conv = conv_mod
        data_mod = types.ModuleType("torch_geometric.data")
        data_mod.HeteroData = _HeteroData
        tg.typing = typing_mod
        tg.utils = utils_mod
        tg.nn = nn_mod
        tg.data = data_mod
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.typing"] = typing_mod
        sys.modules["torch_geometric.utils"] = utils_mod
        sys.modules["torch_geometric.utils.sparse"] = sparse_mod
        sys.modules["torch_geometric.nn"] = nn_mod
        sys.modules["torch_geometric.nn.conv"] = conv_mod
        sys.modules["torch_geometric.data"] = data_mod

    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        errors_mod = types.ModuleType("hydra.errors")

        class InstantiationException(Exception):
            pass

        errors_mod.InstantiationException = InstantiationException
        utils_mod2 = types.ModuleType("hydra.utils")

        def instantiate(cfg, *args, **kwargs):
            import functools
            import importlib

            partial_flag = bool(kwargs.pop("_partial_", False))
            kwargs.pop("_recursive_", None)
            target = cfg["_target_"] if isinstance(cfg, dict) else cfg._target_
            mod, _, name = target.rpartition(".")
            fn = getattr(importlib.import_module(mod), name)
            extra = {k: v for k, v in dict(cfg).items() if not k.startswith("_")}
            extra.update(kwargs)
            if partial_flag or (isinstance(cfg, dict) and cfg.get("_partial_")):
                return functools.partial(fn, *args, **extra)
            return fn(*args, **extra)

        utils_mod2.instantiate = instantiate
        hydra.errors = errors_mod
        hydra.utils = utils_mod2
        sys.modules["hydra"] = hydra
        sys.modules["hydra.errors"] = errors_mod
        sys.modules["hydra.utils"] = utils_mod2

    if "anemoi.utils" not in sys.modules:
        utils_pkg = types.ModuleType("anemoi.utils")
        config_mod = types.ModuleType("anemoi.utils.config")
        config_mod.DotDict = _DotDict
        utils_pkg.config = config_mod
        sys.modules["anemoi.utils"] = utils_pkg
        sys.modules["anemoi.utils.config"] = config_mod


def default_layer_kernels() -> "_DotDict":
    """The reference's default layer kernel set (torch.nn classes; exact-erf
    GELU, matching anemoi_tpu's 'gelu')."""
    import functools

    return _DotDict(
        Linear=torch.nn.Linear,
        LayerNorm=torch.nn.LayerNorm,
        Activation=torch.nn.GELU,
        # the reference default: AutocastLayerNorm(bias=False) (utils.py:107)
        QueryNorm=functools.partial(torch.nn.LayerNorm, bias=False),
        KeyNorm=functools.partial(torch.nn.LayerNorm, bias=False),
    )
