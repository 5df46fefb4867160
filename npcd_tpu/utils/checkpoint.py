"""Two-tier checkpointing (orbax).

Rebuild of the reference checkpoint_utils (npcd/utils/checkpoint_utils.py):

  * CheckpointSaver  — full train-state snapshots with keep-N GC and
    ``<name>-iter-%09d`` directory naming (TrainStateSaver equivalent)
  * save_weights_only / load_weights_only — deployable param-only snapshots
    (WeightsOnlySaver equivalent)

Both operate on arbitrary pytrees via orbax StandardCheckpointer; iteration
numbers are parsed back from directory names for auto-resume.
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional, Tuple

import jax
import orbax.checkpoint as ocp

_ITER_RE = re.compile(r"-iter-(\d{9})$")


def _iter_of(path: str) -> Optional[int]:
    m = _ITER_RE.search(os.path.basename(path.rstrip("/")))
    return int(m.group(1)) if m else None


class CheckpointSaver:
    def __init__(self, base_dir: str, base_name: str, max_to_keep: Optional[int] = 3):
        self.base_dir = os.path.abspath(base_dir)
        self.base_name = base_name
        self.max_to_keep = max_to_keep
        os.makedirs(self.base_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, iteration: int) -> str:
        return os.path.join(self.base_dir, f"{self.base_name}-iter-{iteration:09d}")

    def list_checkpoints(self) -> List[Tuple[int, str]]:
        out = []
        if not os.path.isdir(self.base_dir):
            return out
        for name in os.listdir(self.base_dir):
            if not name.startswith(self.base_name + "-iter-"):
                continue
            path = os.path.join(self.base_dir, name)
            it = _iter_of(path)
            if it is not None and os.path.isdir(path):
                out.append((it, path))
        return sorted(out)

    def save(self, state: Any, iteration: int) -> str:
        path = self._path(iteration)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        self._gc()
        return path

    def _gc(self) -> None:
        if self.max_to_keep is None:
            return
        ckpts = self.list_checkpoints()
        for _, path in ckpts[: max(0, len(ckpts) - self.max_to_keep)]:
            shutil.rmtree(path, ignore_errors=True)

    def latest(self) -> Optional[Tuple[int, str]]:
        ckpts = self.list_checkpoints()
        return ckpts[-1] if ckpts else None

    def restore(self, target: Any, path: Optional[str] = None) -> Tuple[Any, int]:
        """Restore into the structure of `target`; returns (state, iteration)."""
        if path is None:
            latest = self.latest()
            if latest is None:
                raise FileNotFoundError(f"no checkpoints under {self.base_dir}")
            it, path = latest
        else:
            it = _iter_of(path) or 0
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        state = self._ckptr.restore(path, abstract)
        return state, it


def save_weights_only(path: str, params: Any) -> None:
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_weights_only(path: str, target: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(os.path.abspath(path), abstract)
