"""Checkpoint save/restore via Orbax.

TPU-native counterpart of the reference's ``torch.save`` checkpoints with a
best-model copy (reference: examples/utils.py:62-68, imagenet.py:218-256).
Stores the full nnx state (params + BatchNorm stats + binarizer state like
the learnable alpha — the state_dict round-trip requirement,
test/test_binarize.py:95-110) plus optimizer state and scalar metadata.

Restoring across recipe-step reconfigurations works the same way the
reference's ``strict=False`` does: ``restore_into`` transfers every leaf
whose path and shape match and reports the rest.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp
from flax import nnx

__all__ = ["save_checkpoint", "load_checkpoint", "restore_into"]


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, model: nnx.Module, opt_state: Any = None,
                    metadata: Optional[Dict] = None, is_best: bool = False,
                    best_path: Optional[str] = None) -> None:
    """Save model (+ optional optimizer state and metadata) to ``path``.

    With ``is_best=True`` also copies to ``best_path`` (default
    ``path + '.best'``), mirroring the reference's best-model copy
    (examples/utils.py:62-68).
    """
    path = os.path.abspath(path)
    state = nnx.state(model)
    payload = {"model": nnx.to_pure_dict(state)}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if metadata:
        payload["metadata"] = dict(metadata)
    if os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, payload)
    if is_best:
        best = os.path.abspath(best_path or path + ".best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)


def load_checkpoint(path: str) -> Dict:
    """Load the raw checkpoint payload dict."""
    return _checkpointer().restore(os.path.abspath(path))


def restore_into(model: nnx.Module, payload: Dict, strict: bool = True):
    """Restore a payload's model state into ``model``.

    ``strict=False`` transfers only leaves whose path+shape match (the
    reference's mismatched-keys fallback, imagenet.py:236-242) and returns
    the list of skipped paths.
    """
    state = nnx.state(model)
    saved = payload["model"]
    skipped = []

    if strict:
        nnx.replace_by_pure_dict(state, saved)
        nnx.update(model, state)
        return []

    def _walk(pure, prefix=()):
        if isinstance(pure, dict):
            for k, v in pure.items():
                yield from _walk(v, prefix + (k,))
        else:
            yield prefix, pure

    flat_saved = dict(_walk(saved))
    pure_cur = nnx.to_pure_dict(state)
    flat_cur = dict(_walk(pure_cur))
    merged = {}
    for path, cur in flat_cur.items():
        new = flat_saved.get(path)
        if new is not None and np.shape(new) == np.shape(cur):
            merged[path] = new
        else:
            merged[path] = cur
            skipped.append(".".join(map(str, path)))

    def _unflatten(flat):
        root: Dict = {}
        for path, v in flat.items():
            d = root
            for k in path[:-1]:
                d = d.setdefault(k, {})
            d[path[-1]] = v
        return root

    nnx.replace_by_pure_dict(state, _unflatten(merged))
    nnx.update(model, state)
    return skipped
