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
from h5py import h5s

from .normalize import (FieldStats, SCALAR_FIELDS, normalize_field,
                        normalize_field_inplace)
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
                 allow_stats_trim_mismatch: bool = False,
                 raw_layout: bool = False):
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
        # raw_layout=True keeps multichannel fields in their on-disk (C, S)
        # layout (no host transpose): for `Trainer(normalize_stats=...)`'s
        # on-device normalization path, where the (B,C,S)->(B,S,C) swap and
        # the log/asinh/z-score all fold into the compiled train step and
        # the host loader does nothing but read bytes (2.5x ingest
        # throughput, benchmarks/loader_bench.py). Pair with
        # normalize_fields=() so the host skips normalization too.
        self.raw_layout = raw_layout
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
        if (name in MULTICHANNEL_FIELDS and data.ndim == 2
                and not self.raw_layout):
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

    # -- batched IO -----------------------------------------------------------

    def _process_field_batch(self, name: str, data: np.ndarray) -> np.ndarray:
        """Batch-level counterpart of `_process_field` (data: (B, ...) raw,
        a buffer THIS READER OWNS): trim/normalize run ONCE over the whole
        batch — in place, zero temporaries — and the (B, C, S) -> (B, S, C)
        transpose is one swapaxes copy at the end."""
        data = self._trim_field(name, data)  # view into the owned buffer
        if data.dtype != self.dtype:
            data = data.astype(self.dtype)
        wants_norm = (self.stats is not None and name in self.stats
                      and name in NORMALIZABLE_FIELDS
                      and (self.normalize_fields is None
                           or name in self.normalize_fields))
        if wants_norm:
            data = normalize_field_inplace(
                data, name, self.stats[name],
                channel_axis=-2 if data.ndim == 3 else -1)
        if (name in MULTICHANNEL_FIELDS and data.ndim == 3
                and not self.raw_layout):
            return np.ascontiguousarray(np.swapaxes(data, 1, 2))
        return np.ascontiguousarray(data)

    def read_batch(self, indices: Sequence[int]) -> Batch:
        """Read a whole batch into preallocated arrays, then trim/normalize/
        transpose at BATCH granularity.

        Semantically identical to `collate([self[i] for i in indices])` but
        ~7x faster cold (benchmarks/loader_bench.py): the per-sample path
        pays the normalization mask/where construction and z-score broadcast
        per (sample, field) pair — at 7 fields x batch 32 that Python work
        dominates the actual LZF decompression. Rows are read one chunk at a
        time via `read_direct` straight into the batch buffer (measured 15x
        faster than h5py's fancy-index point selection, which builds a
        compound dataspace selection). The reference hides the same
        overhead behind DataLoader worker processes; batched reads keep
        ingest single-process and jitter-free on a TPU VM host.
        """
        indices = [int(i) for i in indices]
        if self.cache_size > 0:
            with self._cache_lock:
                all_cached = all(i in self._cache for i in indices)
            # collate must run OUTSIDE the lock: __getitem__ re-acquires it
            if all_cached:
                return self.collate(indices)
        pairs = [self.index_map[i] for i in indices]
        by_file: Dict[int, List[Tuple[int, int]]] = {}
        for pos, (fi, si) in enumerate(pairs):
            by_file.setdefault(fi, []).append((pos, si))

        out = Batch()
        n = len(indices)
        raw: Dict[str, np.ndarray] = {}
        rows_written: Dict[str, int] = {}
        guids: Optional[List[Optional[str]]] = None
        for fi, group in by_file.items():
            f = self._open(fi)
            fields = (list(f.keys()) if self.load_fields is None
                      else [k for k in self.load_fields if k in f])
            for name in fields:
                dset = f[name]
                if name == "guid":
                    if guids is None:
                        guids = [None] * n
                    for pos, si in group:
                        g = dset[si]
                        guids[pos] = (g.decode() if isinstance(g, bytes)
                                      else str(g))
                    continue
                buf = raw.get(name)
                row = dset.shape[1:]
                if buf is None:
                    buf = np.empty((n,) + row, dtype=dset.dtype)
                    raw[name] = buf
                # one chunk-aligned hyperslab read per row, straight into
                # the batch buffer via the low-level API (2x faster than
                # read_direct: skips _hl's per-call dataspace construction)
                fspace = dset.id.get_space()
                mspace = h5s.create_simple((1,) + row)
                zeros = (0,) * len(row)
                for pos, si in group:
                    fspace.select_hyperslab((si,) + zeros, (1,) + row)
                    dset.id.read(mspace, fspace, buf[pos:pos + 1])
                rows_written[name] = rows_written.get(name, 0) + len(group)

        for name, count in rows_written.items():
            # mixed per-file schemas would leave uninitialized buffer rows;
            # fail loudly like the per-sample path does (KeyError there)
            if count != n:
                raise KeyError(
                    f"field {name!r} present in only {count}/{n} of the "
                    "batch's source files — mixed dataset schemas")

        for name, data in raw.items():
            if name in ("cs_label", "bg_label"):
                out[name] = data.astype(bool)
            else:
                out[name] = self._process_field_batch(name, data)
        if guids is not None:
            out["guid"] = guids

        if self.cache_size > 0:
            with self._cache_lock:
                for k, idx in enumerate(indices):
                    if idx in self._cache:
                        continue
                    if len(self._cache) >= self.cache_size:
                        self._cache.pop(next(iter(self._cache)))
                    # per-sample views into the batch arrays (zero-copy;
                    # every row is cached, so the batch memory is all live).
                    # Labels become python bools to match __getitem__'s
                    # per-sample contract (collate type-switches on bool).
                    self._cache[idx] = Batch(
                        {name: (bool(v[k])
                                if name in ("cs_label", "bg_label")
                                else v[k]) for name, v in out.items()})
        return out

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
            yield self.read_batch(chunk)


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
