"""Field normalization: log/asinh transforms + per-channel z-scoring.

Pure-jnp re-implementation of the reference's `normalize_tensor_data`
(/root/reference/hdf5_dataset/hdf5_dataset.py:18-137) so the exact same
function runs (a) on the host ingest path and (b) *inside jit* for
on-the-fly recomputed coefficients during evaluation (the reference re-uses
it at model/graph_model.py:1340-1350). Channel transform assignments are
static Python data; the math is traceable.

Semantics (matching the reference bit-for-bit in structure):
  fhr / up      : (x - mean) / (std + 1e-8), scalar stats
  fhr_st        : log(clip(x, 0) + log_eps) on channels 1..C-1, channel 0
                  raw; then per-channel z-score
  fhr_ph / fhr_up_ph : asinh(x) on all channels; then per-channel z-score
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

EPS = 1e-8
DEFAULT_LOG_EPSILON = 1e-6


def _ns(data):
    """Pick the array namespace: NumPy for host ndarrays (the ingest path
    must not dispatch eager device ops — on this platform each eager op is a
    round-trip through the TPU tunnel), jnp for traced/device values."""
    return np if isinstance(data, (np.ndarray, np.generic)) else jnp

# Default channel-transform assignment for the production schema
# (reference hdf5_dataset.py:383-391, calculate_dataset_stats.py:52-60).
DEFAULT_LOG_CONFIG: Dict[str, object] = {"fhr_st": "all_except_0"}
DEFAULT_ASINH_CONFIG: Dict[str, object] = {"fhr_ph": "all", "fhr_up_ph": "all"}
SCALAR_FIELDS = ("fhr", "up")


def resolve_channels(config_value, n_channels: int) -> np.ndarray:
    """Expand 'all' / 'all_except_0' / explicit index lists to an index array."""
    if config_value == "all":
        return np.arange(n_channels)
    if config_value == "all_except_0":
        return np.arange(1, n_channels)
    if config_value is None:
        return np.zeros(0, dtype=np.int64)
    return np.asarray(list(config_value), dtype=np.int64)


@dataclass(frozen=True)
class FieldStats:
    """Normalization statistics + transform assignment for one field."""
    mean: np.ndarray          # () for scalar fields, (C,) otherwise
    variance: np.ndarray
    log_channels: Tuple[int, ...] = ()
    asinh_channels: Tuple[int, ...] = ()
    log_epsilon: float = DEFAULT_LOG_EPSILON
    count: int = 0

    @property
    def std(self) -> np.ndarray:
        return np.sqrt(self.variance)


def apply_channel_transforms(data: jnp.ndarray,
                             log_channels: Sequence[int],
                             asinh_channels: Sequence[int],
                             log_epsilon: float,
                             channel_axis: int = -2) -> jnp.ndarray:
    """Apply log / asinh transforms to selected channels (traceable).

    Instead of the reference's in-place scatter writes, builds per-channel
    select masks — XLA fuses these into the surrounding elementwise ops.
    `data`: (..., C, S) by default.
    """
    xp = _ns(data)
    n_channels = data.shape[channel_axis]
    choice = np.zeros(n_channels, dtype=np.int32)  # 0 raw, 1 log, 2 asinh
    choice[list(log_channels)] = 1
    choice[list(asinh_channels)] = 2
    if not choice.any():
        return data
    shape = [1] * data.ndim
    shape[channel_axis] = n_channels
    sel = xp.asarray(choice).reshape(shape)
    logged = xp.log(xp.clip(data, 0.0, None) + log_epsilon)
    asinhed = xp.arcsinh(data)
    return xp.where(sel == 1, logged, xp.where(sel == 2, asinhed, data))


def normalize_field(data: jnp.ndarray, field_name: str, stats: FieldStats,
                    channel_axis: int = -2) -> jnp.ndarray:
    """Normalize one field with precomputed stats. Traceable.

    Scalar fields: plain z-score. Multi-channel fields ((..., C, S) layout):
    channel transform, then per-channel z-score with broadcast stats.
    """
    xp = _ns(data)
    if field_name in SCALAR_FIELDS:
        return (data - float(stats.mean)) / (float(stats.std) + EPS)
    x = apply_channel_transforms(data, stats.log_channels,
                                 stats.asinh_channels, stats.log_epsilon,
                                 channel_axis)
    shape = [1] * data.ndim
    shape[channel_axis] = data.shape[channel_axis]
    mean = xp.asarray(stats.mean, dtype=data.dtype).reshape(shape)
    std = xp.asarray(stats.std, dtype=data.dtype).reshape(shape)
    return (x - mean) / (std + EPS)


def _contiguous_range(channels: Sequence[int]) -> Optional[Tuple[int, int]]:
    if len(channels) == 0:
        return (0, 0)
    a = np.asarray(channels)
    if len(a) == 1 or (np.diff(np.sort(a)) == 1).all():
        return int(a.min()), int(a.max()) + 1
    return None


def normalize_field_inplace(data: np.ndarray, field_name: str,
                            stats: FieldStats,
                            channel_axis: int = -2) -> np.ndarray:
    """Host-ingest fast path: semantically identical to `normalize_field`
    but mutates `data` (a float ndarray the CALLER OWNS) with zero
    temporaries. The production transform assignments are contiguous
    channel ranges (fhr_st: log on 1..C-1; fhr_ph/fhr_up_ph: asinh on all),
    so the transforms run as sliced in-place ufuncs instead of
    `normalize_field`'s compute-log-AND-asinh-then-select — which is the
    right shape for XLA fusion inside jit but 2x wasted flops on the host
    loader's critical path (benchmarks/loader_bench.py). Non-contiguous
    assignments fall back to the reference implementation."""
    if field_name in SCALAR_FIELDS:
        data -= float(stats.mean)
        data /= float(stats.std) + EPS
        return data
    log_r = _contiguous_range(stats.log_channels)
    asinh_r = _contiguous_range(stats.asinh_channels)
    if log_r is None or asinh_r is None:
        return np.asarray(normalize_field(data, field_name, stats,
                                          channel_axis))

    def chan_slice(lo: int, hi: int) -> Tuple[slice, ...]:
        sl = [slice(None)] * data.ndim
        sl[channel_axis] = slice(lo, hi)
        return tuple(sl)

    if log_r[1] > log_r[0]:
        v = data[chan_slice(*log_r)]
        np.clip(v, 0.0, None, out=v)
        v += stats.log_epsilon
        np.log(v, out=v)
    if asinh_r[1] > asinh_r[0]:
        v = data[chan_slice(*asinh_r)]
        np.arcsinh(v, out=v)
    shape = [1] * data.ndim
    shape[channel_axis] = data.shape[channel_axis]
    data -= stats.mean.reshape(shape).astype(data.dtype, copy=False)
    data /= stats.std.reshape(shape).astype(data.dtype, copy=False) + EPS
    return data


def denormalize_field(data: jnp.ndarray, field_name: str, stats: FieldStats,
                      channel_axis: int = -2) -> jnp.ndarray:
    """Invert `normalize_field` (including the channel transforms), used by
    the evaluation/plotting suite to recover physical units."""
    xp = _ns(data)
    if field_name in SCALAR_FIELDS:
        return data * (float(stats.std) + EPS) + float(stats.mean)
    shape = [1] * data.ndim
    shape[channel_axis] = data.shape[channel_axis]
    mean = xp.asarray(stats.mean, dtype=data.dtype).reshape(shape)
    std = xp.asarray(stats.std, dtype=data.dtype).reshape(shape)
    x = data * (std + EPS) + mean
    n_channels = data.shape[channel_axis]
    choice = np.zeros(n_channels, dtype=np.int32)
    choice[list(stats.log_channels)] = 1
    choice[list(stats.asinh_channels)] = 2
    if not choice.any():
        return x
    sel_shape = [1] * data.ndim
    sel_shape[channel_axis] = n_channels
    sel = xp.asarray(choice).reshape(sel_shape)
    unlogged = xp.exp(x) - stats.log_epsilon
    unasinhed = xp.sinh(x)
    return xp.where(sel == 1, unlogged, xp.where(sel == 2, unasinhed, x))


def default_field_stats(field_name: str, mean, variance,
                        n_channels: Optional[int] = None,
                        log_epsilon: float = DEFAULT_LOG_EPSILON) -> FieldStats:
    """Build FieldStats with the production transform assignment."""
    mean = np.asarray(mean, dtype=np.float32)
    variance = np.asarray(variance, dtype=np.float32)
    if field_name in SCALAR_FIELDS:
        return FieldStats(mean=mean, variance=variance,
                          log_epsilon=log_epsilon)
    n = n_channels if n_channels is not None else len(mean)
    log_ch = tuple(resolve_channels(DEFAULT_LOG_CONFIG.get(field_name), n))
    asinh_ch = tuple(resolve_channels(DEFAULT_ASINH_CONFIG.get(field_name), n))
    return FieldStats(mean=mean, variance=variance,
                      log_channels=log_ch, asinh_channels=asinh_ch,
                      log_epsilon=log_epsilon)
