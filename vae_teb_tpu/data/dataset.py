"""Host-side data-loading runtime for HDF5 scattering datasets.

JAX-native replacement for the reference's torch Dataset/DataLoader stack
(/root/reference/hdf5_dataset/hdf5_dataset.py:295-900): filtering, trimming,
normalization, and (C, S) -> (S, C) layout happen here on the host; batches
are plain NumPy dicts handed to `device_put` double-buffering (see
`prefetch_to_device`). Data-parallel sharding replaces torch's
DistributedSampler with deterministic shard slicing of a shuffled epoch
permutation (drop_last semantics preserved).
"""

from __future__ import annotations

import os
import threading
import warnings
from queue import Queue
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from .normalize import FieldStats, SCALAR_FIELDS, normalize_field
from .stats import load_stats, stats_file_trim_minutes

import jax
import jax.numpy as jnp

MULTICHANNEL_FIELDS = ("fhr_st", "fhr_ph", "fhr_up_ph")
NORMALIZABLE_FIELDS = SCALAR_FIELDS + MULTICHANNEL_FIELDS


class Batch(dict):
    """Dict with attribute-style access (batch.fhr_st etc.)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


class CombinedHDF5Dataset:
    """Multi-file HDF5 dataset with filtering, trimming, and normalization.

    Mirrors the reference's constructor surface (paths, load_fields,
    allowed_guids, cs/bg label filters, epoch range, target-label filter,
    cache, stats_path, normalize_fields, trim_minutes) with identical
    filtering semantics (:593-643) and per-sample processing (:706-779).
    """

    def __init__(self,
                 paths,
                 load_fields: Optional[Sequence[str]] = None,
                 allowed_guids: Optional[Sequence[str]] = None,
                 cs_label: Optional[bool] = None,
                 bg_label: Optional[bool] = None,
                 epoch_min: Optional[float] = None,
                 epoch_max: Optional[float] = None,
                 label: Optional[int] = None,
                 cache_size: int = 2000,
                 dtype=np.float32,
                 stats_path: Optional[str] = None,
                 normalize_fields: Optional[Sequence[str]] = None,
                 trim_minutes: Optional[float] = None,
                 sample_rate_hz: float = 4.0,
                 decimation: int = 16,
                 allow_stats_trim_mismatch: bool = False):
        self.paths = [paths] if isinstance(paths, str) else list(paths)
        self.load_fields = None if load_fields is None else set(load_fields)
        self.allowed_guids = set(allowed_guids) if allowed_guids else None
        self.cs_label = cs_label
        self.bg_label = bg_label
        self.epoch_min = epoch_min
        self.epoch_max = epoch_max
        self.label = label
        self.cache_size = cache_size
        self.dtype = dtype
        self.normalize_fields = (set(normalize_fields)
                                 if normalize_fields is not None else None)
        self.trim_minutes = trim_minutes
        if trim_minutes is not None:
            self.trim_raw = int(sample_rate_hz * 60 * trim_minutes)
            self.trim_dec = self.trim_raw // decimation
        else:
            self.trim_raw = 0
            self.trim_dec = 0

        self._handles: List[Optional[h5py.File]] = [None] * len(self.paths)
        self._locks = [threading.Lock() for _ in self.paths]
        self._cache: Dict[int, Batch] = {}
        self._cache_lock = threading.Lock()
        self.index_map: List[Tuple[int, int]] = []

        self.stats: Optional[Dict[str, FieldStats]] = None
        if stats_path is not None:
            if os.path.exists(stats_path):
                self.stats = load_stats(stats_path)
                stats_trim = stats_file_trim_minutes(stats_path)
                declared = trim_minutes if trim_minutes is not None else -1.0
                # Hard error, not the reference's warn-and-continue
                # (SURVEY.md §7.5: trim mismatch silently mis-normalizes).
                if stats_trim != declared and not allow_stats_trim_mismatch:
                    raise ValueError(
                        f"stats file trim_minutes={stats_trim} != dataset "
                        f"trim_minutes={declared}; stats were computed over a "
                        "different window — pass allow_stats_trim_mismatch="
                        "True to override")
            else:
                warnings.warn(f"stats file not found: {stats_path}; "
                              "normalization disabled")

        self._build_index()
        if not self.index_map:
            raise ValueError("No samples match the specified filters.")

    # -- index ----------------------------------------------------------------

    def _build_index(self) -> None:
        for fidx, path in enumerate(self.paths):
            if not os.path.exists(path):
                warnings.warn(f"HDF5 file not found: {path}")
                continue
            with h5py.File(path, "r", libver="latest") as f:
                guids = f["guid"][()]
                epochs = f["epoch"][()]
                cs = f["cs_label"][()]
                bg = f["bg_label"][()]
                n = len(guids)
                ok = np.ones(n, dtype=bool)
                if self.epoch_min is not None:
                    ok &= epochs >= self.epoch_min
                if self.epoch_max is not None:
                    ok &= epochs <= self.epoch_max
                if self.cs_label is not None:
                    ok &= cs == self.cs_label
                if self.bg_label is not None:
                    ok &= bg == self.bg_label
                for i in np.where(ok)[0]:
                    g = guids[i].decode() if isinstance(guids[i], bytes) else str(guids[i])
                    if self.allowed_guids and g not in self.allowed_guids:
                        continue
                    if self.label is not None:
                        if not np.any(f["target"][i] == self.label):
                            continue
                    self.index_map.append((fidx, int(i)))

    def __len__(self) -> int:
        return len(self.index_map)

    # -- IO -------------------------------------------------------------------

    def _open(self, file_idx: int) -> h5py.File:
        with self._locks[file_idx]:
            if self._handles[file_idx] is None:
                try:
                    self._handles[file_idx] = h5py.File(
                        self.paths[file_idx], "r", libver="latest", swmr=True,
                        rdcc_nbytes=128 * 1024 ** 2, rdcc_nslots=10007,
                        rdcc_w0=0.75)
                except Exception:
                    self._handles[file_idx] = h5py.File(
                        self.paths[file_idx], "r", libver="latest")
            return self._handles[file_idx]

    def close(self) -> None:
        for i, lock in enumerate(self._locks):
            with lock:
                if self._handles[i] is not None:
                    try:
                        self._handles[i].close()
                    finally:
                        self._handles[i] = None

    def _trim_field(self, name: str, data: np.ndarray) -> np.ndarray:
        if self.trim_minutes is None:
            return data
        if name in SCALAR_FIELDS:
            t = self.trim_raw
            return data[..., t:-t] if t else data
        if name in MULTICHANNEL_FIELDS + ("target", "weight"):
            t = self.trim_dec
            if name in ("target", "weight"):
                return data[..., t:-t] if t else data
            return data[..., :, t:-t] if t else data
        return data

    def _process_field(self, name: str, data: np.ndarray) -> np.ndarray:
        data = self._trim_field(name, data).astype(self.dtype)
        wants_norm = (self.stats is not None and name in self.stats
                      and name in NORMALIZABLE_FIELDS
                      and (self.normalize_fields is None
                           or name in self.normalize_fields))
        if wants_norm:
            data = np.asarray(normalize_field(data, name, self.stats[name],
                                              channel_axis=0 if data.ndim == 2 else -2))
        if name in MULTICHANNEL_FIELDS and data.ndim == 2:
            data = np.ascontiguousarray(data.T)  # (C, S) -> (S, C)
        return data

    def __getitem__(self, idx: int) -> Batch:
        if self.cache_size > 0:
            with self._cache_lock:
                if idx in self._cache:
                    return self._cache[idx]
        file_idx, sample_idx = self.index_map[idx]
        f = self._open(file_idx)
        fields = (list(f.keys()) if self.load_fields is None
                  else [k for k in self.load_fields if k in f])
        out = Batch()
        for name in fields:
            data = f[name][sample_idx]
            if name == "guid":
                out[name] = data.decode() if isinstance(data, bytes) else str(data)
            elif name in ("cs_label", "bg_label"):
                out[name] = bool(data)
            else:
                out[name] = self._process_field(name, np.asarray(data))
        if self.cache_size > 0:
            with self._cache_lock:
                if len(self._cache) >= self.cache_size:
                    self._cache.pop(next(iter(self._cache)))
                self._cache[idx] = out
        return out

    def get_the_lists(self):
        """GUIDs, epochs, targets for every indexed sample (bulk read)."""
        guids, epochs, targets = [], [], []
        byfile: Dict[int, List[int]] = {}
        for fi, si in self.index_map:
            byfile.setdefault(fi, []).append(si)
        for fi, sis in byfile.items():
            f = self._open(fi)
            sis = sorted(sis)
            guids.extend(g.decode() if isinstance(g, bytes) else str(g)
                         for g in f["guid"][sis])
            epochs.extend(f["epoch"][sis])
            targets.extend(f["target"][sis])
        return guids, epochs, targets

    # -- batching -------------------------------------------------------------

    def epoch_indices(self, shuffle: bool, seed: int,
                      shard_index: int = 0, shard_count: int = 1,
                      drop_last: bool = True) -> np.ndarray:
        """Deterministic per-epoch sample order for one data-parallel shard.

        Equivalent to torch DistributedSampler(shuffle, drop_last=True)
        (reference hdf5_dataset.py:879-887): global permutation seeded by
        epoch, then interleaved assignment to shards, truncated so every
        shard sees the same count.
        """
        n = len(self)
        order = (np.random.default_rng(seed).permutation(n) if shuffle
                 else np.arange(n))
        if shard_count > 1:
            if drop_last:
                n_even = (n // shard_count) * shard_count
                order = order[:n_even]
            order = order[shard_index::shard_count]
        return order

    def collate(self, indices: Sequence[int]) -> Batch:
        samples = [self[int(i)] for i in indices]
        out = Batch()
        for key in samples[0]:
            vals = [s[key] for s in samples]
            if isinstance(vals[0], (np.ndarray, np.generic)):
                out[key] = np.stack(vals)
            elif isinstance(vals[0], bool):
                out[key] = np.asarray(vals)
            else:
                out[key] = vals  # guids: keep as list
        return out

    def as_batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                   shard_index: int = 0, shard_count: int = 1,
                   drop_last: bool = True) -> Iterator[Batch]:
        order = self.epoch_indices(shuffle, seed, shard_index, shard_count,
                                   drop_last)
        for start in range(0, len(order), batch_size):
            chunk = order[start:start + batch_size]
            if drop_last and len(chunk) < batch_size:
                return
            yield self.collate(chunk)


def prefetch_to_device(iterator: Iterator[Batch], size: int = 2,
                       sharding=None,
                       array_fields: Optional[Sequence[str]] = None
                       ) -> Iterator[Batch]:
    """Double-buffer host batches onto the device(s).

    A background thread stages `device_put` transfers `size` batches ahead so
    host HDF5 reads and normalization overlap device compute — the TPU
    equivalent of the reference's pinned-memory + prefetch_factor DataLoader
    settings (:688-704, :894-896).
    `sharding` (e.g. a NamedSharding over the data axis) places each array
    directly in its distributed layout.
    """
    q: Queue = Queue(maxsize=size)
    _END = object()

    def put(batch: Batch) -> Batch:
        out = Batch()
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype.kind == "f":
                if array_fields is None or k in array_fields:
                    out[k] = jax.device_put(v, sharding)
                    continue
            out[k] = v
        return out

    def worker():
        try:
            for batch in iterator:
                q.put(put(batch))
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
