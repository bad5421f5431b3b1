"""Data layer: HDF5 schema, statistics, normalization, host ingest, synthesis."""

from .dataset import Batch, CombinedHDF5Dataset, prefetch_to_device
from .inspect import describe_hdf5, format_report, plot_sample
from .normalize import (FieldStats, apply_channel_transforms,
                        default_field_stats, denormalize_field,
                        normalize_field, normalize_field_inplace)
from .packed import PackedWindowStore
from .schema import append_batch, append_sample, create_initial_hdf5, dataset_info
from .splits import create_cv_splits, guid_label_splits
from .stats import DatasetStatsCalculator, load_stats
from .synthetic import (build_dataset, build_dataset_from_records,
                        find_flat_regions, passes_qc, synthetic_fhr_up,
                        synthetic_records, window_record)

__all__ = [
    "Batch", "CombinedHDF5Dataset", "prefetch_to_device",
    "describe_hdf5", "format_report", "plot_sample",
    "FieldStats", "apply_channel_transforms", "default_field_stats",
    "denormalize_field", "normalize_field", "normalize_field_inplace",
    "PackedWindowStore",
    "append_batch", "append_sample", "create_initial_hdf5", "dataset_info",
    "DatasetStatsCalculator", "load_stats",
    "create_cv_splits", "guid_label_splits",
    "build_dataset", "build_dataset_from_records", "find_flat_regions",
    "passes_qc", "synthetic_fhr_up", "synthetic_records", "window_record",
]
