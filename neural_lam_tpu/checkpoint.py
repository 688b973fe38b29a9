"""Checkpointing via orbax (ref behavior: neural_lam/train_model.py:264-270,
ar_model.py:698-721 — keep `min_val_loss` + `last`, optimizer state restored
only on request, graph/statics never stored: checkpoints hold learned params
(+ optimizer state + progress metadata) and are re-attached to graphs/stats
loaded from disk at restore time)."""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir, name: str, params, opt_state=None, meta=None):
    """Save params (+opt_state) under <ckpt_dir>/<name>/."""
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute() / name
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": _np_tree(params)}
    if opt_state is not None:
        payload["opt_state"] = _np_tree(opt_state)
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(str(path) + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_checkpoint(ckpt_path, params_template, opt_state_template=None):
    """Restore a checkpoint into the given template structures.

    Returns (params, opt_state_or_None, meta_dict).
    """
    import orbax.checkpoint as ocp

    path = Path(ckpt_path).absolute()
    ckptr = ocp.StandardCheckpointer()
    template = {"params": _np_tree(params_template)}
    has_opt = opt_state_template is not None and _ckpt_has_opt_state(path)
    if has_opt:
        template["opt_state"] = _np_tree(opt_state_template)
    restored = ckptr.restore(path, target=template)
    meta = {}
    meta_path = str(path) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored["params"], restored.get("opt_state"), meta


def _ckpt_has_opt_state(path) -> bool:
    try:
        with open(Path(path) / "_METADATA") as f:
            return '"opt_state"' in f.read()
    except OSError:
        return (Path(path) / "opt_state").exists()
