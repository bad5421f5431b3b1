"""Orbax checkpointing with best-k-on-metric retention + surgery helpers.

Replaces the reference's Lightning ModelCheckpoint(save_top_k=2 on
val/total_loss) and raw state_dict saves
(/root/reference/model/graph_model.py:448-455,872-877), and the key-prefix
surgery used to move weights between the VAE and the classifier wrapper
(graph_model.py:381-390, vae_teb_model.py:1323-1347).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class Checkpointer:
    """Save/restore TrainState pytrees, keeping the best `keep` by metric
    (lower is better) plus always the latest."""

    def __init__(self, directory: str, keep: int = 2):
        if not _HAS_ORBAX:
            raise RuntimeError("orbax-checkpoint is unavailable")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = os.path.join(self.directory, "index.json")
        self._index: List[Dict] = []
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, state, step: int, metric: Optional[float] = None) -> None:
        path = self._path(step)
        self._ckptr.save(path, jax.device_get(state), force=True)
        # block until committed: async background saves race interpreter
        # shutdown in short-lived CLI runs
        self._ckptr.wait_until_finished()
        self._index.append({"step": step, "metric": metric, "path": path})
        self._gc()
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=2)

    def _gc(self) -> None:
        if len(self._index) <= self.keep + 1:
            return
        latest = max(self._index, key=lambda e: e["step"])
        scored = [e for e in self._index if e["metric"] is not None]
        best = sorted(scored, key=lambda e: e["metric"])[:self.keep]
        keep_paths = {latest["path"]} | {e["path"] for e in best}
        for entry in list(self._index):
            if entry["path"] not in keep_paths:
                self._index.remove(entry)
                try:
                    import shutil
                    shutil.rmtree(entry["path"], ignore_errors=True)
                except OSError:
                    pass

    def best(self) -> Optional[Dict]:
        scored = [e for e in self._index if e["metric"] is not None]
        return min(scored, key=lambda e: e["metric"]) if scored else None

    def latest(self) -> Optional[Dict]:
        return max(self._index, key=lambda e: e["step"]) if self._index else None

    def restore(self, target, step: Optional[int] = None,
                best: bool = False):
        """Restore into the structure of `target` (a template TrainState)."""
        if best:
            entry = self.best()
        elif step is not None:
            entry = next((e for e in self._index if e["step"] == step), None)
        else:
            entry = self.latest()
        if entry is None:
            raise FileNotFoundError("no checkpoint matches the request")
        return self._ckptr.restore(entry["path"],
                                   jax.device_get(target))


def transfer_params(src_params: Dict, dst_params: Dict,
                    src_prefix: Tuple[str, ...] = (),
                    dst_prefix: Tuple[str, ...] = (),
                    strict: bool = False) -> Tuple[Dict, List[str]]:
    """Copy matching param subtrees between models (checkpoint surgery).

    E.g. loading a pretrained VAE into SeqVaeTebClassifier:
        transfer_params(vae_state.params, cls_params,
                        dst_prefix=("vae_model",))
    Returns (updated dst, list of copied paths). Missing paths are skipped
    unless strict.
    """
    src_flat = jax.tree_util.tree_flatten_with_path(src_params)[0]
    src_map = {tuple(getattr(k, "key", str(k)) for k in path): leaf
               for path, leaf in src_flat}
    dst_flat, treedef = jax.tree_util.tree_flatten_with_path(dst_params)
    copied, new_leaves = [], []
    for path, leaf in dst_flat:
        key = tuple(getattr(k, "key", str(k)) for k in path)
        if key[:len(dst_prefix)] == dst_prefix:
            lookup = src_prefix + key[len(dst_prefix):]
            if lookup in src_map:
                src_leaf = src_map[lookup]
                if np.shape(src_leaf) != np.shape(leaf):
                    if strict:
                        raise ValueError(f"shape mismatch at {key}")
                    new_leaves.append(leaf)
                    continue
                new_leaves.append(src_leaf)
                copied.append("/".join(key))
                continue
            if strict:
                raise KeyError(f"missing source param for {key}")
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), copied
