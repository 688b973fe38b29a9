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
    def conv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # multi-host: params/opt_state are fully replicated, so the
            # first addressable shard IS the full value
            x = x.addressable_data(0)
        return np.asarray(x)

    return jax.tree_util.tree_map(conv, tree)


def save_checkpoint(ckpt_dir, name: str, params, opt_state=None, meta=None):
    """Save params (+opt_state) under <ckpt_dir>/<name>/.

    Multi-host: orbax saves are collective — EVERY process must call this
    (with identical replicated values); only process 0 removes a stale
    directory and writes the metadata sidecar.
    """
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute() / name
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": _np_tree(params)}
    if opt_state is not None:
        payload["opt_state"] = _np_tree(opt_state)
    if jax.process_index() == 0 and path.exists():
        import shutil

        shutil.rmtree(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"nlt_ckpt_rm_{name}")
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if meta is not None and jax.process_index() == 0:
        with open(str(path) + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_checkpoint(ckpt_path, params_template, opt_state_template=None):
    """Restore a checkpoint into the given template structures.

    Returns (params, opt_state_or_None, meta_dict).
    """
    import orbax.checkpoint as ocp

    path = Path(ckpt_path).absolute()
    # restore without a template (gives plain nested containers), then merge
    # into the provided templates — robust to checkpoints that contain an
    # optimizer state the caller doesn't want (ref behavior of
    # ar_model.py:719-721: optimizer state dropped unless --restore_opt)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    params = _merge_like(params_template, restored["params"], "params")
    opt_state = None
    if opt_state_template is not None and "opt_state" in restored:
        opt_state = _merge_like(
            opt_state_template, restored["opt_state"], "opt_state"
        )
    restored = {"params": params}
    if opt_state is not None:
        restored["opt_state"] = opt_state
    meta = {}
    meta_path = str(path) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored["params"], restored.get("opt_state"), meta


def _merge_like(template, restored, name):
    """Fill the template's structure with restored values (shape-checked)."""
    import jax.tree_util as jtu

    t_leaves, treedef = jtu.tree_flatten(template)
    r_leaves = jtu.tree_leaves(restored)
    assert len(t_leaves) == len(r_leaves), (
        f"checkpoint {name} has {len(r_leaves)} leaves, expected "
        f"{len(t_leaves)}"
    )
    out = []
    for t, r in zip(t_leaves, r_leaves):
        r = np.asarray(r)
        t_shape = tuple(np.shape(t))
        assert tuple(r.shape) == t_shape, (
            f"checkpoint {name}: leaf shape {r.shape} vs expected {t_shape}"
        )
        out.append(r.astype(np.asarray(t).dtype) if t_shape else r)
    return jtu.tree_unflatten(treedef, out)
