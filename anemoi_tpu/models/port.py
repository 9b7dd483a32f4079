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
    keep_attention = False  # dense Transformer blocks have a real submodule
    gnn_scan_offset = False  # GNN scan stacks layers 1.. (blocks_0 separate)
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("node_attributes_"):
            out += ["node_attributes", "trainable_tensors", p[len("node_attributes_"):]]
            i += 1
            continue
        if p.startswith("noise_cond_mlp_"):
            # transport noise-conditioning MLP (ref transport_encoder_
            # processor_decoder.py:93: linear{1,2}_no_gradscaling)
            out += ["noise_cond_mlp", p[len("noise_cond_mlp_"):] + "_no_gradscaling"]
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
        if p.startswith("TransformerProcessor"):
            # dense Transformer flavour: the ref block keeps a real
            # `attention` submodule (block.py:123-197), unlike the GT block
            # where our attention module is inlined
            out += ["processor"]
            provider = ["processor_graph_provider"]
            keep_attention = True
            i += 1
            continue
        if p.startswith("GNNForwardMapper"):
            out += ["encoder", dataset]
            provider = ["encoder_graph_provider", dataset]
            i += 1
            continue
        if p.startswith("GNNBackwardMapper"):
            out += ["decoder", dataset]
            provider = ["decoder_graph_provider", dataset]
            i += 1
            continue
        if p.split("_")[0] in ("NoiseConditioning", "NoiseInjector",
                               "NoOpNoiseInjector"):
            # ensemble noise injector (ref ens_encoder_processor_decoder.py:60
            # self.noise_injector)
            out += ["noise_injector"]
            i += 1
            continue
        if p.startswith("GNNProcessor"):
            # layer 0 is a standalone module (it embeds raw edge attrs);
            # the scan stacks layers 1.. -> ref proc indices offset by one
            out += ["processor"]
            provider = ["processor_graph_provider"]
            gnn_scan_offset = True
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
            out += ["proc", "{layer1}" if gnn_scan_offset else "{layer}"]
            i += 1
            continue
        if p.startswith("blocks_") and p.split("_")[1].isdigit():
            # standalone (unscanned) processor layer, e.g. the GNN's first
            out += ["proc", p.split("_")[1]]
            i += 1
            continue
        if p == "block":
            i += 1
            continue
        if p == "attention" and not keep_attention:
            # GT blocks: our attention submodule is inlined in the ref block
            i += 1
            continue
        if p == "out_proj":  # dense MHSA output projection (ref: projection)
            out += ["projection"]
            i += 1
            continue
        if p in ("layer_norm_attention", "layer_norm_attention_src",
                 "layer_norm_attention_dst", "layer_norm_mlp", "layer_norm_mlp_dst",
                 "extractor_norm", "q_norm", "k_norm"):
            ref = {
                "layer_norm_attention_dst": "layer_norm_attention_dest",
                # GT blocks name the dst-side MLP norm `_dst`; the dense
                # Transformer block (keep_attention) uses the plain name
                **({} if keep_attention else
                   {"layer_norm_mlp": "layer_norm_mlp_dst"}),
                "extractor_norm": "node_data_extractor.0",
            }.get(p, p)
            out += ref.split(".")
            if parts[i + 1] == "ln":
                i += 2  # plain LayerNorm: skip the inner "ln"
            else:
                # ConditionalLayerNorm: keep the scale/bias Linear submodules
                # (ref normalization.py: self.scale / self.bias)
                i += 1
            continue
        if p in ("node_dst_mlp", "node_src_mlp", "mlp", "emb_edges",
                 "emb_nodes_src", "emb_nodes_dst", "node_data_extractor",
                 "edge_mlp", "node_mlp", "noise_mlp") and (
            parts[i + 1] in ("ffn_in", "linear_out", "norm")
            or parts[i + 1].startswith("ffn_")
        ):
            # flax MLP {ffn_in, ffn_i..., linear_out, norm} -> reference
            # Sequential mlp.{0,2,4,...} + sibling layer_norm (mlp.py:97);
            # same-named plain Dense modules (the GT mappers' emb_nodes_*)
            # fall through untouched
            nxt = parts[i + 1]
            if nxt == "norm":
                out += [p, "layer_norm"]
                i += 3  # skip "norm" and the inner "ln"
                continue
            out += [p, "mlp"]
            i += 1
            if nxt == "ffn_in":
                out += ["0"]
                i += 2  # skip "linear"
            elif nxt.startswith("ffn_"):
                out += [str(2 * (int(nxt.split("_")[1]) + 1))]
                i += 2  # skip "linear"
            elif nxt == "linear_out":
                # final Linear = the LARGEST even Sequential index; depends
                # on n_extra_layers, resolved against the state dict by
                # _fetch ("{mlp_out}")
                out += ["{mlp_out}"]
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


def _mlp_out_index(path, flat) -> int:
    """Sequential index of an MLP's final Linear: 2 * (1 + #extra ffn
    layers), counted from the sibling paths of this ``linear_out`` leaf."""
    parent = tuple(path[:-2])  # strip ("linear_out", "kernel"/"bias")
    extra = {
        str(pp[len(parent)])
        for pp in flat
        if tuple(pp[: len(parent)]) == parent
        and str(pp[len(parent)]).startswith("ffn_")
        and str(pp[len(parent)]) != "ffn_in"
    }
    return 2 * (1 + len(extra))


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
        if "{mlp_out}" in name:
            name = name.replace("{mlp_out}", str(_mlp_out_index(path, flat)))
        if "{layer" in name:
            for layer in range(value.shape[0]):
                key = name.replace("{layer}", str(layer)).replace(
                    "{layer1}", str(layer + 1)
                )
                out[key] = _to_torch_layout(path, value[layer])
        else:
            out[name] = _to_torch_layout(path, value)
    return out


def _to_torch_layout(path, value: np.ndarray) -> np.ndarray:
    if str(path[-1]) == "kernel" and value.ndim == 2:
        return value.T.copy()  # flax [in,out] -> torch [out,in]
    return value


def _fetch(state_dict: Dict[str, np.ndarray], name: str):
    """One reference tensor by mapped name; the fused qkv kernel is
    synthesized from the reference's separate lin_q/lin_k/lin_v weights
    (torch layout: concat along the output axis; the standard kernel
    transpose then yields flax's [in, q|k|v] order)."""
    if "{mlp_out}" in name:
        # the MLP's final Linear: the largest even Sequential index present
        for k in (10, 8, 6, 4, 2):
            cand = name.replace("{mlp_out}", str(k))
            if cand in state_dict:
                return np.asarray(state_dict[cand])
        return None
    if name in state_dict:
        return np.asarray(state_dict[name])
    if name.endswith(".qkv.weight"):
        base = name[: -len(".qkv.weight")]
        try:
            return np.concatenate(
                [np.asarray(state_dict[f"{base}.lin_{p}.weight"]) for p in "qkv"],
                axis=0,
            )
        except KeyError:
            return None
    return None


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
        if "{layer" in name:
            layers = []
            for layer in range(np.asarray(value).shape[0]):
                key = name.replace("{layer}", str(layer)).replace(
                    "{layer1}", str(layer + 1)
                )
                v = _fetch(state_dict, key)
                if v is None:
                    missing.append(key)
                    layers = None
                    break
                layers.append(_to_torch_layout(spath, v))
            new_flat[path] = (
                np.stack(layers).astype(np.asarray(value).dtype)
                if layers is not None
                else value
            )
        else:
            v = _fetch(state_dict, name)
            if v is None:
                missing.append(name)
                new_flat[path] = value
                continue
            new_flat[path] = _to_torch_layout(spath, v).astype(
                np.asarray(value).dtype
            )
    if missing:
        raise KeyError(f"reference state dict missing {len(missing)} params, e.g. {missing[:5]}")
    restored = flax.traverse_util.unflatten_dict(new_flat)
    if "params" in params_template:
        return {"params": restored}
    return restored
