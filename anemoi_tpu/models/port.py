"""Weight porting between reference (PyTorch) checkpoints and flax params.

Supports the parity workflow of BASELINE.md ("allclose prognostic fields from
identical weights"): map the reference's `AnemoiModelEncProcDec` state-dict
names (see /root/reference/models/src/anemoi/models/layers/{mapper,block,
processor,mlp}.py and models/models/encoder_processor_decoder.py) onto this
framework's parameter pytree for the GraphTransformer flavour.

Conventions translated:
- torch ``Linear.weight [out,in]``      -> flax ``kernel [in,out]`` (transposed)
- torch ``LayerNorm.weight/bias``       -> flax ``ln.scale / ln.bias``
- reference MLP ``mlp.0 / mlp.2``       -> flax ``ffn_in.linear / linear_out``
- processor ModuleList ``proc.<i>.*``   -> nn.scan stacked params (axis 0)
- ``node_attributes.trainable_tensors.<name>.trainable``
                                        -> ``node_attributes_<name>.trainable``

The mapping is exercised by a round-trip test (flax -> reference names ->
flax); validation against a real reference checkpoint needs one on disk.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _is_linear_kernel(path: Tuple[str, ...]) -> bool:
    return path[-1] == "kernel"


# hierarchical module-name prefixes -> (reference module path prefix builder,
# reference graph-provider ModuleDict name); order matters: longer prefixes
# first so "proc_down_h1" never matches "down_"
_HIER_PREFIXES = (
    ("proc_down_", "down_level_processor", "down_level_processor_graph_providers"),
    ("proc_up_", "up_level_processor", "up_level_processor_graph_providers"),
    ("encoder_", "encoder", "encoder_graph_provider"),
    ("decoder_", "decoder", "decoder_graph_provider"),
    ("down_", "downscale", "downscale_graph_providers"),
    ("up_", "upscale", "upscale_graph_providers"),
)


def _hier_component(p: str):
    """Explicit hierarchical module name -> (ref path parts, provider path)."""
    if p == "processor":
        return ["processor"], ["processor_graph_provider"]
    for prefix, ref, prov in _HIER_PREFIXES:
        if p.startswith(prefix):
            key = p[len(prefix):]
            return [ref, key], [prov, key]
    return None


def _ref_name(path: Tuple[str, ...], dataset: str = "data") -> str:
    """Map one flax param path to the reference state-dict name."""
    parts: List[str] = list(path)
    out: List[str] = ["model"]
    # graph-provider path for this component's trainable edge features
    provider: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("node_attributes_"):
            out += ["node_attributes", "trainable_tensors", p[len("node_attributes_"):]]
            i += 1
            continue
        if p == "trainable_edges":
            # trainable edge features live on the graph PROVIDER in the
            # reference layout (graph_provider.py:254 StaticGraphProvider
            # .trainable = TrainableTensor)
            out = ["model"] + provider + ["trainable"]
            i += 1
            continue
        if p.startswith("GraphTransformerForwardMapper"):
            out += ["encoder", dataset]
            provider = ["encoder_graph_provider", dataset]
            i += 1
            continue
        if p.startswith("GraphTransformerBackwardMapper"):
            out += ["decoder", dataset]
            provider = ["decoder_graph_provider", dataset]
            i += 1
            continue
        if p.startswith("GraphTransformerProcessor"):
            out += ["processor"]
            provider = ["processor_graph_provider"]
            i += 1
            continue
        # --- hierarchical model components (models/hierarchical.py explicit
        # module names -> reference AnemoiModelEncProcDecHierarchical
        # ModuleDict layout, ref models/hierarchical.py:40-195) -------------
        hier = _hier_component(p)
        if hier is not None:
            ref_parts, provider = hier
            out += ref_parts
            i += 1
            continue
        if p == "blocks":  # scanned processor stack -> proc.<i> handled by caller
            out += ["proc", "{layer}"]
            i += 1
            continue
        if p == "block":
            i += 1
            continue
        if p == "attention":  # our attention submodule is inlined in the ref block
            i += 1
            continue
        if p in ("layer_norm_attention", "layer_norm_attention_src",
                 "layer_norm_attention_dst", "layer_norm_mlp", "layer_norm_mlp_dst",
                 "extractor_norm", "q_norm", "k_norm"):
            ref = {
                "layer_norm_attention_dst": "layer_norm_attention_dest",
                "layer_norm_mlp": "layer_norm_mlp_dst",
                "extractor_norm": "node_data_extractor.0",
            }.get(p, p)
            out += ref.split(".")
            i += 2  # skip the inner "ln"
            continue
        if p in ("node_dst_mlp", "node_src_mlp", "mlp"):
            out += [p, "mlp"]
            i += 1
            # ffn_in.linear -> 0 ; linear_out -> 2 (Linear, act, Linear)
            nxt = parts[i]
            if nxt == "ffn_in":
                out += ["0"]
                i += 2  # skip "linear"
            elif nxt == "linear_out":
                out += ["2"]
                i += 1
            continue
        if p == "extractor":
            out += ["node_data_extractor", "1"]
            i += 1
            continue
        out.append(p)
        i += 1
    name = ".".join(out)
    suffix = parts[-1]
    if suffix == "kernel":
        name = name.rsplit(".kernel", 1)[0] + ".weight"
    elif suffix == "scale":
        name = name.rsplit(".scale", 1)[0] + ".weight"
    elif suffix == "bias":
        pass  # already .bias
    return name


def flax_to_reference(params, dataset: str = "data") -> Dict[str, np.ndarray]:
    """Export flax params as a reference-style numpy state dict.

    Scanned processor stacks (leading layer axis) are split into per-layer
    entries ``...proc.<i>...``."""
    import flax

    flat = flax.traverse_util.flatten_dict(params.get("params", params))
    out: Dict[str, np.ndarray] = {}
    for path, value in flat.items():
        value = np.asarray(value)
        name = _ref_name(tuple(str(p) for p in path), dataset)
        stacked = "{layer}" in name
        if stacked:
            for layer in range(value.shape[0]):
                v = value[layer]
                out[name.replace("{layer}", str(layer))] = _to_torch_layout(path, v)
        else:
            out[name] = _to_torch_layout(path, value)
    return out


def _to_torch_layout(path, value: np.ndarray) -> np.ndarray:
    if str(path[-1]) == "kernel" and value.ndim == 2:
        return value.T.copy()  # flax [in,out] -> torch [out,in]
    return value


def reference_to_flax(state_dict: Dict[str, np.ndarray], params_template, dataset: str = "data"):
    """Load a reference-style state dict into a params pytree shaped like
    ``params_template``; raises KeyError listing any unmatched parameters."""
    import flax

    container = params_template.get("params", params_template)
    flat = flax.traverse_util.flatten_dict(container)
    # accept both naming conventions: the bare nn.Module state dict
    # (model.state_dict(): "encoder.data...") and the training-checkpoint
    # form with the interface's "model." prefix
    state_dict = dict(state_dict)
    for k in list(state_dict):
        if not k.startswith("model."):
            state_dict.setdefault(f"model.{k}", state_dict[k])
    new_flat = {}
    missing = []
    for path, value in flat.items():
        spath = tuple(str(p) for p in path)
        name = _ref_name(spath, dataset)
        if "{layer}" in name:
            layers = []
            for layer in range(np.asarray(value).shape[0]):
                key = name.replace("{layer}", str(layer))
                if key not in state_dict:
                    missing.append(key)
                    layers = None
                    break
                layers.append(_to_torch_layout(spath, np.asarray(state_dict[key])))
            new_flat[path] = (
                np.stack(layers).astype(np.asarray(value).dtype)
                if layers is not None
                else value
            )
        else:
            if name not in state_dict:
                missing.append(name)
                new_flat[path] = value
                continue
            new_flat[path] = _to_torch_layout(spath, np.asarray(state_dict[name])).astype(
                np.asarray(value).dtype
            )
    if missing:
        raise KeyError(f"reference state dict missing {len(missing)} params, e.g. {missing[:5]}")
    restored = flax.traverse_util.unflatten_dict(new_flat)
    if "params" in params_template:
        return {"params": restored}
    return restored
