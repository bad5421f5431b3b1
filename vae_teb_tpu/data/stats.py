"""Per-channel dataset statistics with post-transform moments.

Replaces the reference's DatasetStatsCalculator
(/root/reference/hdf5_dataset/calculate_dataset_stats.py:14-947): per-batch
sum / sum-of-squares reductions are vectorized over all channels at once
(the reference loops channel-by-channel on GPU) and accumulate in float64 on
the host. The pass is HDF5-IO-bound, and TPUs have no fast f64 — shipping
batches to the device would cost more in transfers than the reduction.

Transforms applied *before* the moments, per the production schema:
  fhr_st: log(clip(x,0)+1e-6) on channels 1.., channel 0 raw
  fhr_ph / fhr_up_ph: asinh everywhere
  fhr / up: raw scalar moments

The stats HDF5 file layout matches the reference's `save_stats`
(calculate_dataset_stats.py:364-443) so stats files are interchangeable.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import h5py
import numpy as np

from .normalize import (DEFAULT_ASINH_CONFIG, DEFAULT_LOG_CONFIG,
                        DEFAULT_LOG_EPSILON, FieldStats, SCALAR_FIELDS,
                        apply_channel_transforms, resolve_channels)

STATS_FIELDS = ("fhr", "up", "fhr_st", "fhr_ph", "fhr_up_ph")


def _batch_moments(data: np.ndarray, log_channels, asinh_channels):
    """(B, C, S) -> per-channel (count, sum, sumsq) after transforms,
    ignoring non-finite values. Host-side float64 (the stats pass is
    HDF5-IO-bound; on this platform eager device dispatches cost more
    than the reduction itself)."""
    x = apply_channel_transforms(data.astype(np.float64), log_channels,
                                 asinh_channels, DEFAULT_LOG_EPSILON,
                                 channel_axis=1)
    finite = np.isfinite(x)
    xz = np.where(finite, x, 0.0)
    count = finite.sum(axis=(0, 2))
    s = xz.sum(axis=(0, 2))
    ss = (xz * xz).sum(axis=(0, 2))
    return count, s, ss


def _batch_moments_scalar(data: np.ndarray):
    x = data.astype(np.float64)
    finite = np.isfinite(x)
    xz = np.where(finite, x, 0.0)
    return finite.sum(), xz.sum(), (xz * xz).sum()


@dataclass
class _Acc:
    count: np.ndarray
    s: np.ndarray
    ss: np.ndarray


class DatasetStatsCalculator:
    """Streaming per-channel moments over one or more HDF5 dataset files."""

    def __init__(self, trim_minutes: Optional[float] = None,
                 fields: Sequence[str] = STATS_FIELDS,
                 sample_rate_hz: float = 4.0, decimation: int = 16):
        self.trim_minutes = trim_minutes
        self.fields = tuple(fields)
        if trim_minutes is not None:
            self.trim_raw = int(sample_rate_hz * 60 * trim_minutes)
            self.trim_dec = self.trim_raw // decimation
        else:
            self.trim_raw = 0
            self.trim_dec = 0
        self._acc: Dict[str, _Acc] = {}
        self._channels: Dict[str, int] = {}
        self._shapes: Dict[str, tuple] = {}

    def _transform_channels(self, field: str, n_channels: int):
        log_ch = tuple(resolve_channels(DEFAULT_LOG_CONFIG.get(field), n_channels))
        asinh_ch = tuple(resolve_channels(DEFAULT_ASINH_CONFIG.get(field), n_channels))
        return log_ch, asinh_ch

    def _trim(self, field: str, data: np.ndarray) -> np.ndarray:
        if self.trim_minutes is None:
            return data
        if field in SCALAR_FIELDS:
            t = self.trim_raw
            return data[:, t:-t] if t else data
        t = self.trim_dec
        return data[:, :, t:-t] if t else data

    def update(self, field: str, data: np.ndarray) -> None:
        """Accumulate one batch (B, S) or (B, C, S), pre-trim layout."""
        data = self._trim(field, np.asarray(data))
        if field in SCALAR_FIELDS:
            c, s, ss = _batch_moments_scalar(data)
            acc = self._acc.setdefault(field, _Acc(np.zeros(()), np.zeros(()),
                                                   np.zeros(())))
            self._shapes.setdefault(field, data.shape[1:])
        else:
            n_ch = data.shape[1]
            self._channels[field] = n_ch
            self._shapes.setdefault(field, data.shape[1:])
            log_ch, asinh_ch = self._transform_channels(field, n_ch)
            c, s, ss = _batch_moments(data, log_ch, asinh_ch)
            acc = self._acc.setdefault(
                field, _Acc(np.zeros(n_ch), np.zeros(n_ch), np.zeros(n_ch)))
        acc.count = acc.count + c
        acc.s = acc.s + s
        acc.ss = acc.ss + ss

    def calculate_stats(self, hdf5_files: Sequence[str],
                        batch_size: int = 64) -> Dict[str, FieldStats]:
        """Stream every file/field through the device reduction."""
        for path in hdf5_files:
            with h5py.File(path, "r") as f:
                n = f["fhr"].shape[0]
                for start in range(0, n, batch_size):
                    sl = slice(start, min(start + batch_size, n))
                    for field in self.fields:
                        if field in f:
                            self.update(field, f[field][sl])
        return self.finalize()

    def finalize(self) -> Dict[str, FieldStats]:
        out: Dict[str, FieldStats] = {}
        for field, acc in self._acc.items():
            safe = np.where(acc.count > 0, acc.count, 1)
            mean = acc.s / safe
            var = np.maximum(acc.ss / safe - mean ** 2, 0.0)
            mean = np.where(acc.count > 0, mean, 0.0)
            var = np.where(acc.count > 0, var, 0.0)
            if field in SCALAR_FIELDS:
                out[field] = FieldStats(mean=np.float32(mean),
                                        variance=np.float32(var),
                                        count=int(acc.count))
            else:
                n_ch = self._channels[field]
                log_ch, asinh_ch = self._transform_channels(field, n_ch)
                out[field] = FieldStats(mean=mean.astype(np.float32),
                                        variance=var.astype(np.float32),
                                        log_channels=log_ch,
                                        asinh_channels=asinh_ch,
                                        count=int(acc.count.sum()))
        return out

    # -- persistence (reference-compatible layout) ---------------------------

    def save_stats(self, stats: Dict[str, FieldStats], output_path: str,
                   metadata: Optional[Dict] = None) -> None:
        with h5py.File(output_path, "w", libver="latest") as f:
            if metadata:
                mg = f.create_group("metadata")
                for k, v in metadata.items():
                    mg.attrs[k] = v
            f.attrs["created_at"] = datetime.datetime.now().isoformat()
            f.attrs["trim_minutes"] = (self.trim_minutes
                                       if self.trim_minutes is not None else -1.0)
            f.attrs["log_epsilon"] = DEFAULT_LOG_EPSILON
            for field, st in stats.items():
                g = f.create_group(field)
                g.attrs["shape"] = self._shapes.get(field, np.shape(st.mean))
                g.attrs["count"] = st.count
                if field in SCALAR_FIELDS:
                    g.create_dataset("mean", data=st.mean, dtype="f4")
                    g.create_dataset("variance", data=st.variance, dtype="f4")
                    g.create_dataset("std", data=np.sqrt(st.variance), dtype="f4")
                    g.attrs["mean_scalar"] = float(st.mean)
                    g.attrs["variance_scalar"] = float(st.variance)
                    g.attrs["std_scalar"] = float(np.sqrt(st.variance))
                else:
                    n_ch = len(st.mean)
                    g.attrs["n_channels"] = n_ch
                    g.create_dataset("mean", data=st.mean, dtype="f4")
                    g.create_dataset("variance", data=st.variance, dtype="f4")
                    g.create_dataset("std", data=np.sqrt(st.variance), dtype="f4")
                    regular = [c for c in range(n_ch)
                               if c not in st.log_channels
                               and c not in st.asinh_channels]
                    g.attrs["regular_channels"] = regular
                    g.attrs["log_channels"] = list(st.log_channels)
                    g.attrs["asinh_channels"] = list(st.asinh_channels)
                    g.attrs["uses_log_transform"] = len(st.log_channels) > 0
                    g.attrs["uses_asinh_transform"] = len(st.asinh_channels) > 0


def load_stats(stats_path: str) -> Dict[str, FieldStats]:
    """Load a stats file written by this module or the reference."""
    out: Dict[str, FieldStats] = {}
    with h5py.File(stats_path, "r") as f:
        log_eps = float(f.attrs.get("log_epsilon", DEFAULT_LOG_EPSILON))
        for field in f.keys():
            if field == "metadata":
                continue
            g = f[field]
            if field in SCALAR_FIELDS:
                mean = np.float32(g.attrs["mean_scalar"])
                var = np.float32(g.attrs["variance_scalar"])
                out[field] = FieldStats(mean=mean, variance=var,
                                        log_epsilon=log_eps,
                                        count=int(g.attrs.get("count", 0)))
            else:
                mean = g["mean"][()]
                var = g["variance"][()]
                n_ch = len(mean)
                if "log_channels" in g.attrs:
                    log_ch = tuple(int(c) for c in g.attrs["log_channels"])
                    asinh_ch = tuple(int(c) for c in g.attrs.get("asinh_channels", []))
                elif "order0_channels" in g.attrs:
                    # backward compat with old stats files (reference :497-509)
                    order0 = set(int(c) for c in g.attrs["order0_channels"])
                    log_ch = tuple(c for c in range(n_ch) if c not in order0)
                    asinh_ch = ()
                else:
                    log_ch, asinh_ch = (), ()
                out[field] = FieldStats(mean=mean.astype(np.float32),
                                        variance=var.astype(np.float32),
                                        log_channels=log_ch,
                                        asinh_channels=asinh_ch,
                                        log_epsilon=log_eps,
                                        count=int(g.attrs.get("count", 0)))
    return out


def stats_file_trim_minutes(stats_path: str) -> float:
    with h5py.File(stats_path, "r") as f:
        return float(f.attrs.get("trim_minutes", -1.0))
