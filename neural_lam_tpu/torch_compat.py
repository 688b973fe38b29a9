"""Torch checkpoint import/export for parity with reference Neural-LAM.

Maps the reference's PyTorch(-Lightning) state-dict keys onto our param
pytrees (and back). Naming follows the reference module tree:

  grid_embedder.0.weight ...            (make_mlp Sequential: Linear at 2i,
  g2m_gnn.edge_mlp.0.weight ...          output LayerNorm at 2n-1;
  processor.module_0.edge_mlp...         ref: neural_lam/utils.py:191-214)
  mesh_down_gnns.{p}.{l}.aggr_mlp...    (HiLAM nested ModuleLists)
  processor.module_0.edge_mlp.mlps.{c}  (HiLAMParallel SplitMLPs)

Linear weights are transposed ((out,in) -> (in,out)). Handles the legacy
`g2m_gnn.grid_mlp.*` -> `encoding_grid_mlp.*` rename the reference applies
on checkpoint load (ref: neural_lam/models/ar_model.py:698-721).
"""

from __future__ import annotations

import numpy as np


def _mlp_key_pairs(prefix: str, mlp_params: dict):
    """Yield (torch_key, path, transpose) pairs for one MLP pytree."""
    n = len(mlp_params["layers"])
    for i in range(n):
        yield f"{prefix}.{2 * i}.weight", ("layers", i, "w"), True
        yield f"{prefix}.{2 * i}.bias", ("layers", i, "b"), False
    if mlp_params["ln"] is not None:
        yield f"{prefix}.{2 * n - 1}.weight", ("ln", "scale"), False
        yield f"{prefix}.{2 * n - 1}.bias", ("ln", "bias"), False


def _inet_key_pairs(prefix: str, inet_params: dict):
    for key, path, tr in _mlp_key_pairs(f"{prefix}.edge_mlp",
                                        inet_params["edge_mlp"]):
        yield key, ("edge_mlp",) + path, tr
    for key, path, tr in _mlp_key_pairs(f"{prefix}.aggr_mlp",
                                        inet_params["aggr_mlp"]):
        yield key, ("aggr_mlp",) + path, tr


def _chunked_inet_key_pairs(prefix: str, params: dict):
    """HiLAMParallel SplitMLPs: {prefix}.edge_mlp.mlps.{c}...."""
    for c, mlp in enumerate(params["edge_mlps"]):
        for key, path, tr in _mlp_key_pairs(f"{prefix}.edge_mlp.mlps.{c}", mlp):
            yield key, ("edge_mlps", c) + path, tr
    for c, mlp in enumerate(params["aggr_mlps"]):
        for key, path, tr in _mlp_key_pairs(f"{prefix}.aggr_mlp.mlps.{c}", mlp):
            yield key, ("aggr_mlps", c) + path, tr


def param_key_map(params: dict):
    """Full (torch_key, path, transpose) list for a model param pytree.

    Dispatches on the pytree's top-level structure, covering all three model
    families.
    """
    pairs = []

    def mlp(name, prefix=None):
        if name in params:
            for key, path, tr in _mlp_key_pairs(prefix or name, params[name]):
                pairs.append((key, (name,) + path, tr))

    def inet(name):
        if name in params:
            for key, path, tr in _inet_key_pairs(name, params[name]):
                pairs.append((key, (name,) + path, tr))

    def mlp_list(name):
        if name in params:
            for i, p in enumerate(params[name]):
                for key, path, tr in _mlp_key_pairs(f"{name}.{i}", p):
                    pairs.append((key, (name, i) + path, tr))

    def inet_list(name):
        if name in params:
            for i, p in enumerate(params[name]):
                for key, path, tr in _inet_key_pairs(f"{name}.{i}", p):
                    pairs.append((key, (name, i) + path, tr))

    def inet_nested(name):
        if name in params:
            for p_i, layer in enumerate(params[name]):
                for l_i, p in enumerate(layer):
                    for key, path, tr in _inet_key_pairs(
                        f"{name}.{p_i}.{l_i}", p
                    ):
                        pairs.append((key, (name, p_i, l_i) + path, tr))

    # BaseGraphModel (all families)
    for name in ("grid_embedder", "g2m_embedder", "m2g_embedder",
                 "encoding_grid_mlp", "output_map"):
        mlp(name)
    inet("g2m_gnn")
    inet("m2g_gnn")

    # GraphLAM
    mlp("mesh_embedder")
    mlp("m2m_embedder")
    if "processor" in params and params["processor"] and (
        "edge_mlp" in params["processor"][0]
    ):
        for i, p in enumerate(params["processor"]):
            for key, path, tr in _inet_key_pairs(f"processor.module_{i}", p):
                pairs.append((key, ("processor", i) + path, tr))
    elif "processor" in params:  # HiLAMParallel chunked processor
        for i, p in enumerate(params["processor"]):
            for key, path, tr in _chunked_inet_key_pairs(
                f"processor.module_{i}", p
            ):
                pairs.append((key, ("processor", i) + path, tr))

    # BaseHiGraphModel
    for name in ("mesh_embedders", "mesh_same_embedders",
                 "mesh_up_embedders", "mesh_down_embedders"):
        mlp_list(name)
    inet_list("mesh_init_gnns")
    inet_list("mesh_read_gnns")

    # HiLAM
    for name in ("mesh_down_gnns", "mesh_down_same_gnns",
                 "mesh_up_gnns", "mesh_up_same_gnns"):
        inet_nested(name)

    return pairs


def _get_path(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set_path(tree, path, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def migrate_legacy_keys(state_dict: dict) -> dict:
    """g2m_gnn.grid_mlp.* -> encoding_grid_mlp.* (ref: ar_model.py:706-718)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("g2m_gnn.grid_mlp"):
            k = k.replace("g2m_gnn.grid_mlp", "encoding_grid_mlp")
        out[k] = v
    return out


def import_state_dict(params: dict, state_dict: dict, strict: bool = True):
    """Fill a param pytree from a torch state dict (numpy-valued ok).

    Accepts both `processor.module_{i}.` (PyG Sequential naming) and
    `processor.{i}.` (plain ModuleList) prefixes.
    """
    import jax.numpy as jnp

    state_dict = migrate_legacy_keys(
        {k: np.asarray(v) for k, v in state_dict.items()}
    )
    used = set()
    missing = []
    for torch_key, path, transpose in param_key_map(params):
        alt = torch_key.replace(".module_", ".")
        key = torch_key if torch_key in state_dict else (
            alt if alt in state_dict else None
        )
        if key is None:
            missing.append(torch_key)
            continue
        val = np.asarray(state_dict[key], dtype=np.float32)
        if transpose:
            val = val.T
        cur = _get_path(params, path)
        assert tuple(val.shape) == tuple(cur.shape), (
            f"{torch_key}: shape {val.shape} vs expected {cur.shape}"
        )
        # jnp.array (not asarray): on CPU, asarray can be ZERO-COPY over
        # aligned numpy buffers, and `tensor.detach().numpy()` shares
        # memory with live torch parameters — an in-place torch
        # optimizer step would then silently mutate the imported params.
        _set_path(params, path, jnp.array(val))
        used.add(key)
    if strict:
        assert not missing, f"missing keys in state dict: {missing[:10]}"
        unused = [
            k for k in state_dict
            if k not in used
            and (k.endswith(".weight") or k.endswith(".bias"))
        ]  # buffers (stats/masks/graph) are rebuilt from the datastore
        assert not unused, f"unused torch keys: {unused[:10]}"
    return params


def export_state_dict(params: dict) -> dict:
    """Inverse of import_state_dict: param pytree -> torch-style state dict."""
    out = {}
    for torch_key, path, transpose in param_key_map(params):
        val = np.asarray(_get_path(params, path))
        out[torch_key] = val.T if transpose else val
    return out


def load_torch_checkpoint(path, params: dict, strict: bool = True):
    """Load a reference Lightning .ckpt (or raw state dict) into params."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    state_dict = {
        k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in state_dict.items()
    }
    return import_state_dict(params, state_dict, strict=strict)
