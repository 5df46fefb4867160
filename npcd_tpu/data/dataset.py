"""Dataset base + numpy batch loader.

TPU-native data layer replacing the reference's torch Dataset/DataLoader
(npcd/data/dataset.py): samples are dicts of numpy arrays, batching is a
plain shuffled iterator that collates with np.stack. Host->device transfer
happens once per step when the jitted train step consumes the batch (with
optional device prefetch in the training loops). Data roots resolve from a
paths.toml next to this file or ~/npcd_tpu_data_paths.toml.
"""
from __future__ import annotations

import abc
import os
import os.path as osp
import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..utils import logging

try:  # tomllib is stdlib on py3.11+
    import tomllib as _toml

    def _load_toml(path):
        with open(path, "rb") as f:
            return _toml.load(f)
except ImportError:  # pragma: no cover
    import tomli as _toml  # type: ignore

    def _load_toml(path):
        with open(path, "rb") as f:
            return _toml.load(f)


def get_paths() -> Dict[str, Any]:
    local = osp.join(osp.dirname(osp.realpath(__file__)), "paths.toml")
    home = osp.join(osp.expanduser("~"), "npcd_tpu_data_paths.toml")
    for path in (local, home):
        if osp.exists(path):
            return _load_toml(path)
    raise FileNotFoundError(
        "No paths.toml found; create npcd_tpu/data/paths.toml or "
        "~/npcd_tpu_data_paths.toml with dataset roots."
    )


def get_path(*keys: str) -> Optional[str]:
    # env override, highest priority: NPCD_TPU_<KEY1>_<KEY2>... (e.g.
    # NPCD_TPU_SRN_ROOT) — used by tools/parity_eval.py --srn-root
    env = "NPCD_TPU_" + "_".join(k.upper() for k in keys)
    if os.environ.get(env):
        return os.environ[env]
    node: Any = get_paths()
    for key in keys:
        if not isinstance(node, dict) or key not in node:
            return None
        node = node[key]
    return node if isinstance(node, (str, list)) else None


class Dataset(abc.ABC):
    def __init__(self, root: Optional[str] = None, verbose: bool = True, **kwargs):
        self.verbose = verbose
        self.root = root
        if self.verbose:
            logging.info(f"Initializing dataset {self.name}" + (f" from {root}" if root else ""))
        self.samples: List[Any] = []
        self._init_samples(**kwargs)
        if self.verbose:
            logging.info(f"\tNumber of samples: {len(self)}")

    @property
    def name(self) -> str:
        return type(self).__name__

    @abc.abstractmethod
    def _init_samples(self, **kwargs):
        ...

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        return self.samples[index]

    def get_loader(
        self,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        indices: Optional[Sequence[int]] = None,
        num_shards: int = 1,
        shard_index: int = 0,
    ) -> "BatchLoader":
        return BatchLoader(self, batch_size, shuffle, drop_last, seed, indices,
                           num_shards, shard_index)

    # -- threaded RAM preload (cf. reference srn.py:107-120) -----------------

    @staticmethod
    def preload_threading(
        load_func: Callable, idx_list: Sequence, num_workers: int = 8, data_str: str = "items"
    ) -> List[Any]:
        idx_list = list(idx_list)
        data_list: List[Any] = [None] * len(idx_list)
        q: "queue.Queue" = queue.Queue()
        for el in enumerate(idx_list):
            q.put(el)

        def worker():
            while True:
                try:
                    i, idx = q.get_nowait()
                except queue.Empty:
                    return
                data_list[i] = load_func(idx)
                q.task_done()

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(num_workers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(x is not None for x in data_list), f"failed preloading {data_str}"
        return data_list


def _use_native_collate() -> bool:
    """Native threaded collate pays off only with cores to thread over:
    measured on a 1-core host it loses to np.stack (25.2 vs 21.8 ms for
    8 x [50, 16384, 3] f32); the memcpy sharding needs >= 4 cores to win."""
    import os

    return (os.cpu_count() or 1) >= 4


def collate(samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    native = _use_native_collate()
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            if (
                native
                and vals[0].dtype == np.float32
                and len(vals) >= 4
                and vals[0].nbytes >= 1 << 20
                # every sample must match: the C++ collate memcpys
                # arrays[0].size floats from each pointer
                and all(
                    v.shape == vals[0].shape and v.dtype == np.float32
                    for v in vals[1:]
                )
            ):
                from .. import runtime

                out[key] = runtime.collate_f32(vals)
            else:
                out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


def prefetch_to_device(iterable, transfer: Callable[[Any], Any], size: int = 2):
    """Stage batches ahead of the consumer: a background thread runs the
    host-side iterator (collate) and `transfer` (device_put/shard_batch —
    async in JAX), so host work and H2D copies overlap the previous train
    step instead of serializing with it. `size` bounds device-resident
    staged batches. Producer exceptions re-raise in the consumer."""
    import queue as _queue

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, size))
    end = object()

    def producer():
        try:
            for item in iterable:
                q.put(transfer(item))
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            q.put(e)
            return
        q.put(end)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is end:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class BatchLoader:
    """Shuffled epoch iterator over a Dataset, collating into numpy batches.

    Multi-host data parallelism (num_shards > 1): the index space is
    statically strided-partitioned across processes and `batch_size` is
    interpreted as the GLOBAL batch — each process iterates local batches
    of batch_size // num_shards drawn from its own shard (the standard
    distributed-sampler semantic). shard_batch() then
    assembles the per-process slices into one global sharded array.

    When the dataset size is not divisible by num_shards, the index list is
    padded by wrapping (torch DistributedSampler semantics) so every shard
    has exactly ceil(n / num_shards) indices — otherwise per-process epoch
    lengths differ by one batch and the process with the longer epoch hangs
    in a collective step the others never enter (e.g. SRN-Cars n_obj=2347
    on 8 hosts)."""

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        seed: int = 0,
        indices: Optional[Sequence[int]] = None,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        if batch_size % num_shards:
            raise ValueError(
                f"global batch_size {batch_size} must divide by num_shards {num_shards}"
            )
        self.dataset = dataset
        self.batch_size = batch_size // num_shards  # local batch
        self.shuffle = shuffle
        self.drop_last = drop_last
        all_idx = np.asarray(indices if indices is not None else np.arange(len(dataset)))
        if num_shards > 1 and len(all_idx) % num_shards:
            if len(all_idx) == 0:
                raise ValueError("cannot shard an empty dataset")
            pad = num_shards - len(all_idx) % num_shards
            # wrap-pad so every shard gets the same count; the repeated
            # examples are a vanishing fraction of an epoch (<= num_shards-1
            # of n) and keep all processes' batch counts identical
            all_idx = np.concatenate([all_idx, all_idx[:pad]])
        self.indices = all_idx[shard_index::num_shards]
        self._rng = np.random.default_rng(seed + shard_index)

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        order = self.indices.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        n = len(order)
        stop = n - n % self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            chunk = order[start:start + self.batch_size]
            yield collate([self.dataset[int(i)] for i in chunk])
