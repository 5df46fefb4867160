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
_LAYOUT_SUFFIX = ".layout.json"


def write_layout_meta(ckpt_path: str, meta: dict) -> None:
    """Record parameter-layout metadata (e.g. the fused-qkv channel grouping,
    models/diffusion/transformer.py qkv_groups) in a sidecar JSON next to a
    checkpoint directory. Layouts with identical array shapes but permuted
    channels restore without error and silently corrupt the model; the
    sidecar makes the mismatch detectable at load time."""
    import json

    if jax.process_index() != 0:
        return
    with open(ckpt_path.rstrip("/") + _LAYOUT_SUFFIX, "w") as f:
        json.dump(meta, f)


def read_layout_meta(ckpt_path: str) -> Optional[dict]:
    import json

    p = ckpt_path.rstrip("/") + _LAYOUT_SUFFIX
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def check_layout_meta(ckpt_path: str, expected: dict, what: str = "checkpoint") -> None:
    """Fail loudly when a checkpoint's recorded layout disagrees with the
    layout the current model expects. A sidecar-less checkpoint (pre-layout-
    versioning) gets a warning instead, since its layout is unknowable."""
    from . import logging

    meta = read_layout_meta(ckpt_path)
    if meta is None:
        logging.warning(
            f"{what} {ckpt_path} has no layout metadata sidecar; assuming its "
            f"parameter layout matches the current model ({expected}). If it "
            "was saved under a different qkv_groups, attention will be "
            "silently corrupted — relayout with "
            "npcd_tpu.utils.convert_reference.relayout_qkv."
        )
        return
    mismatch = {k: (meta.get(k), v) for k, v in expected.items()
                if k in meta and meta[k] != v}
    if mismatch:
        raise ValueError(
            f"{what} {ckpt_path} was saved under a different parameter layout: "
            + ", ".join(f"{k}: checkpoint={a} vs model={b}"
                        for k, (a, b) in mismatch.items())
            + ". Shapes match, so a plain restore would silently permute "
            "attention channels. Either construct the model with the "
            "checkpoint's layout (e.g. qkv_groups) or migrate the weights "
            "with npcd_tpu.utils.convert_reference.relayout_qkv."
        )


def _sync(tag: str) -> None:
    """Barrier across processes (no-op single-process) so one process's
    filesystem mutations land before the others proceed."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def timed_save_due(
    last_save_time: float,
    interval_min: float,
    iteration: Optional[int] = None,
    check_every: int = 50,
) -> bool:
    """Wall-clock checkpoint trigger that every process agrees on.

    Clocks differ across hosts; if each process gated on its own clock they
    would call the collective orbax save at different iterations and the
    training loops would desync (one process exits while the rest block in
    a psum). Process 0's decision is broadcast to all.

    The broadcast is a blocking cross-host device collective — running it on
    every training iteration would serialize the async-dispatch pipeline.
    Callers pass the current ``iteration`` so the clock is only consulted
    (and broadcast) every ``check_every`` steps; the iteration counter is
    already identical across processes, so all of them skip or check
    together. A checkpoint then lands at most ``check_every`` steps late,
    irrelevant against a 20-minute interval."""
    import time

    if iteration is not None and iteration % check_every != 0:
        return False
    due = (time.time() - last_save_time) / 60 > interval_min
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        import numpy as np

        due = bool(
            multihost_utils.broadcast_one_to_all(np.asarray(due, np.bool_))
        )
    return due


def _iter_of(path: str) -> Optional[int]:
    m = _ITER_RE.search(os.path.basename(path.rstrip("/")))
    return int(m.group(1)) if m else None


class CheckpointSaver:
    """Full train-state snapshots with keep-N GC.

    Multi-process runs assume ``base_dir`` is on a SHARED filesystem (GCS
    fuse / NFS): orbax's save is collective, and the pre-save rmtree + GC
    run on process 0 only. With per-host local checkpoint dirs, stale
    directories on non-zero processes would never be cleaned and a
    subsequent save could mix old files — point ``base_dir`` at shared
    storage for any jax.process_count() > 1 job.

    ``async_save=True`` uses orbax's AsyncCheckpointer: ``save()`` returns
    once the state has been snapshotted to host memory and the serialization
    runs on a background thread, so training continues during the disk write
    (the reference's ``torch.save`` blocks the step loop for the whole write,
    ``npcd/utils/checkpoint_utils.py:196-239``). At most one save is in
    flight — a new ``save()`` first waits out the previous one — and orbax
    finalizes via tmp-dir+rename, so a crash mid-write never leaves a
    directory that ``latest()``/``restore()`` would pick up. Call
    ``finish()`` before relying on the last checkpoint being on disk."""

    def __init__(self, base_dir: str, base_name: str, max_to_keep: Optional[int] = 3,
                 async_save: bool = False, layout_meta: Optional[dict] = None):
        self.base_dir = os.path.abspath(base_dir)
        self.base_name = base_name
        self.max_to_keep = max_to_keep
        self.async_save = async_save
        self.layout_meta = layout_meta
        os.makedirs(self.base_dir, exist_ok=True)
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
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
        # at most one save in flight (no-op for the sync checkpointer)
        self._ckptr.wait_until_finished()
        # GC now, when every checkpoint on disk is finalized: keep exactly
        # max_to_keep restorable snapshots at all times. (GC'ing right after
        # issuing an async save would have to reserve a slot for the
        # in-flight tmp dir and would leave only max_to_keep-1 restorable
        # snapshots between finalize and the next save.) Disk transiently
        # holds max_to_keep+1 once the new save finalizes, until the next
        # save's GC.
        # The overwrite/GC rmtree must run on exactly one process when the
        # checkpoint dir is on a shared filesystem (orbax's save itself is
        # multi-process collective: every process calls it).
        if jax.process_index() == 0:
            self._gc()
            if os.path.exists(path):
                shutil.rmtree(path)
        _sync("ckpt-pre-save")
        if self.async_save:  # AsyncCheckpointer takes args=, Standard takes the tree
            self._ckptr.save(path, args=ocp.args.StandardSave(state))
        else:
            self._ckptr.save(path, state)
            self._ckptr.wait_until_finished()
            if jax.process_index() == 0:
                self._gc()  # sync save is already finalized; GC immediately
        if self.layout_meta is not None:
            write_layout_meta(path, self.layout_meta)
        return path

    def save_async_from_device(self, state: Any, iteration: int) -> None:
        """Timed-snapshot save that keeps the device->host fetch OFF the
        step loop: an on-device copy (donation-safe, ~ms of HBM
        bandwidth) is taken synchronously, then a background thread runs
        device_get + save(). Motivation (r05 sustained capture,
        docs/experiments/sustained_capture.json): `save(jax.device_get
        (state))` blocked the stage-2 loop ~140 s per snapshot in this
        environment — the ~4.6 GB host fetch over the TPU tunnel — even
        though the orbax serialization itself was already async. At most
        one snapshot is in flight; a new call joins the previous one."""
        import threading

        import jax.numpy as jnp

        prev = getattr(self, "_snap_thread", None)
        if prev is not None and prev.is_alive():
            prev.join()
        # The copy doubles the state's HBM footprint while the fetch is in
        # flight; donation means the original buffers cannot be shared.
        # For large states (the 302M stage-2 train state is ~4.6 GB on a
        # 16 GB chip) that OOMs under the step's own working set —
        # measured RESOURCE_EXHAUSTED in the r05 sustained capture — so
        # fall back to the blocking fetch beyond ~20% of device memory
        # (at the production 20-min cadence the blocking fetch is ~1%
        # overhead; the async path matters for small/frequent snapshots).
        state_bytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(state)
            if hasattr(x, "dtype")
        )
        limit = None
        try:
            stats = jax.local_devices()[0].memory_stats()
            limit = stats.get("bytes_limit") if stats else None
        except Exception:
            pass
        if state_bytes > 0.2 * (limit or 16 * 1024**3):
            self.save(jax.device_get(state), iteration)
            return
        snap = jax.tree_util.tree_map(jnp.copy, state)
        jax.block_until_ready(snap)

        def run():
            self.save(jax.device_get(snap), iteration)

        self._snap_thread = threading.Thread(
            target=run, name="ckpt-snapshot", daemon=True
        )
        self._snap_thread.start()

    def finish(self) -> None:
        """Block until any in-flight async save is committed to disk."""
        prev = getattr(self, "_snap_thread", None)
        if prev is not None and prev.is_alive():
            prev.join()
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            self._gc()

    def _gc(self) -> None:
        if self.max_to_keep is None:
            return
        ckpts = self.list_checkpoints()
        for _, path in ckpts[: max(0, len(ckpts) - self.max_to_keep)]:
            shutil.rmtree(path, ignore_errors=True)
            try:
                os.remove(path + _LAYOUT_SUFFIX)
            except OSError:
                pass

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
        if self.layout_meta is not None:
            check_layout_meta(path, self.layout_meta, what="checkpoint")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        if self.async_save:
            state = self._ckptr.restore(path, args=ocp.args.StandardRestore(abstract))
        else:
            state = self._ckptr.restore(path, abstract)
        return state, it


def save_weights_only(path: str, params: Any,
                      layout_meta: Optional[dict] = None) -> None:
    path = os.path.abspath(path)
    if jax.process_index() == 0 and os.path.exists(path):
        shutil.rmtree(path)
    _sync("weights-pre-save")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()
    if layout_meta is not None:
        write_layout_meta(path, layout_meta)


def load_weights_only(path: str, target: Any, tolerant: bool = False,
                      expected_layout: Optional[dict] = None) -> Any:
    """Restore a weights-only snapshot into the structure of `target`.

    tolerant=True mirrors the reference FlexEmbedding behavior
    (flex_embedding.py:9-26): leaves whose checkpoint shape disagrees with
    the target (e.g. an embedding table saved with a different n_obj) are
    warned about and left at the target's (freshly initialized) value
    instead of raising."""
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    if expected_layout is not None:
        check_layout_meta(path, expected_layout, what="weights snapshot")
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    if not tolerant:
        return ckptr.restore(path, abstract)

    from . import logging

    meta = ckptr.metadata(path).item_metadata.tree
    meta_leaves, meta_def = jax.tree_util.tree_flatten(meta)
    abs_paths, abs_def = jax.tree_util.tree_flatten_with_path(abstract)
    if meta_def != abs_def:
        raise ValueError(
            f"checkpoint tree structure at {path} does not match the target; "
            "tolerant restore only handles per-leaf shape mismatches"
        )

    mismatched = []
    restore_abstract = []
    for (key_path, a), m in zip(abs_paths, meta_leaves):
        m_shape = tuple(getattr(m, "shape", a.shape))
        if m_shape != tuple(a.shape):
            mismatched.append(jax.tree_util.keystr(key_path))
            restore_abstract.append(
                jax.ShapeDtypeStruct(m_shape, getattr(m, "dtype", a.dtype))
            )
        else:
            restore_abstract.append(a)
    restored = ckptr.restore(
        path, jax.tree_util.tree_unflatten(abs_def, restore_abstract)
    )

    if not mismatched:
        return restored
    logging.warning(
        "load_weights_only: shape mismatch for "
        f"{mismatched}; keeping the target's initialized values for these "
        "leaves (reference FlexEmbedding warn-and-reinit semantics)"
    )
    mismatch_set = set(mismatched)
    target_leaves = jax.tree_util.tree_leaves(target)
    restored_leaves = jax.tree_util.tree_leaves(restored)
    out = [
        t if jax.tree_util.keystr(kp) in mismatch_set else r
        for (kp, _), t, r in zip(abs_paths, target_leaves, restored_leaves)
    ]
    return jax.tree_util.tree_unflatten(abs_def, out)
