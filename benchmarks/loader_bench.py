"""Host ingest-throughput benchmark: can the loader feed the chip?

The compiled train step consumes 1550 windows/s/chip (BASELINE.md); the
host pipeline (HDF5 chunk read -> decompress -> trim -> log/asinh ->
z-score -> transpose -> collate) must at least match that or IT becomes
the production bottleneck — a number neither the reference nor rounds 1-2
ever measured. Builds a throwaway production-shape dataset of random
values (the loader doesn't care what the coefficients are), computes real
stats over it, then times `CombinedHDF5Dataset.as_batches` at batch 32
with full normalization, and the same through `prefetch_to_device`.

Usage: python benchmarks/loader_bench.py [--windows N] [--batch B]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_teb_tpu.data import (CombinedHDF5Dataset, DatasetStatsCalculator,
                              prefetch_to_device)
from vae_teb_tpu.data.schema import append_batch, create_initial_hdf5

LEN_SIGNAL, LEN_SEQ = 5760, 360
CHANNELS = {"fhr_st": 43, "fhr_ph": 44, "fhr_up_ph": 130}
TRAIN_FIELDS = ("fhr_st", "fhr_ph", "fhr_up_ph", "fhr")


def build(path: str, n: int, seed: int = 0, chunk: int = 64) -> None:
    rng = np.random.default_rng(seed)
    create_initial_hdf5(path, len_signal=LEN_SIGNAL, len_sequence=LEN_SEQ,
                        channel_counts=CHANNELS)
    for lo in range(0, n, chunk):
        b = min(chunk, n - lo)
        batch = {
            "fhr": np.abs(rng.standard_normal((b, LEN_SIGNAL))).astype(np.float32) + 1.0,
            "up": np.abs(rng.standard_normal((b, LEN_SIGNAL))).astype(np.float32) + 1.0,
            "target": np.ones((b, LEN_SEQ), np.float32),
            "weight": np.ones((b, LEN_SEQ), np.float32),
            "epoch": np.full((b,), 10.0, np.float32),
            "cs_label": np.zeros((b,), bool),
            "bg_label": np.zeros((b,), bool),
            "guid": [f"w{lo + i}" for i in range(b)],
        }
        for f, c in CHANNELS.items():
            batch[f] = np.abs(
                rng.standard_normal((b, c, LEN_SEQ))).astype(np.float32) + 0.1
        append_batch(path, batch)


def time_epochs(make_iter, n_windows: int, min_seconds: float = 4.0):
    """Windows/s over repeated full epochs (>= min_seconds of work)."""
    done, t0 = 0, time.perf_counter()
    while True:
        for batch in make_iter():
            done += len(batch["fhr"])
        dt = time.perf_counter() - t0
        if dt >= min_seconds:
            return done / dt, dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--keep", default=None,
                    help="write the dataset here and keep it (default: tmp)")
    args = ap.parse_args()

    tmp = None
    if args.keep:
        path = args.keep
    else:
        tmp = tempfile.TemporaryDirectory()
        path = os.path.join(tmp.name, "loader_bench.hdf5")
    stats_path = path + ".stats.hdf5"

    if not os.path.exists(path):
        t0 = time.perf_counter()
        build(path, args.windows)
        print(f"built {args.windows} windows "
              f"({os.path.getsize(path) / 1e6:.0f} MB on disk, "
              f"{time.perf_counter() - t0:.1f}s)")
    if not os.path.exists(stats_path):
        calc = DatasetStatsCalculator(trim_minutes=2.0)
        stats = calc.calculate_stats([path], batch_size=64)
        calc.save_stats(stats, stats_path)

    def make_ds(cache: int):
        return CombinedHDF5Dataset(
            path, load_fields=TRAIN_FIELDS + ("target", "weight"),
            stats_path=stats_path, normalize_fields=TRAIN_FIELDS,
            trim_minutes=2.0, cache_size=cache)

    results = {}

    ds = make_ds(cache=0)
    wps, dt = time_epochs(
        lambda: ds.as_batches(args.batch, shuffle=True, seed=0), len(ds))
    results["cold (cache=0)"] = wps
    print(f"as_batches  cache=0   : {wps:8.1f} windows/s  ({dt:.1f}s)")

    ds_hot = make_ds(cache=args.windows)
    for b in ds_hot.as_batches(args.batch, shuffle=False, seed=0):
        pass  # warm the sample cache
    wps, dt = time_epochs(
        lambda: ds_hot.as_batches(args.batch, shuffle=True, seed=1), len(ds_hot))
    results["hot (cached)"] = wps
    print(f"as_batches  cache=hot : {wps:8.1f} windows/s  ({dt:.1f}s)")

    ds_raw = CombinedHDF5Dataset(
        path, load_fields=TRAIN_FIELDS + ("target", "weight"),
        stats_path=stats_path, normalize_fields=(), trim_minutes=2.0,
        cache_size=0, raw_layout=True)
    wps, dt = time_epochs(
        lambda: ds_raw.as_batches(args.batch, shuffle=True, seed=3),
        len(ds_raw))
    results["raw (device-normalize)"] = wps
    print(f"as_batches  raw       : {wps:8.1f} windows/s  ({dt:.1f}s) "
          f"[normalize+transpose folded into the train step]")

    from vae_teb_tpu.data import PackedWindowStore
    packed_dir = path + ".packed"
    if not os.path.exists(os.path.join(packed_dir, "manifest.json")):
        t0 = time.perf_counter()
        store = PackedWindowStore.build(make_ds(cache=0), packed_dir)
        print(f"packed store built in {time.perf_counter() - t0:.1f}s")
    else:
        store = PackedWindowStore(packed_dir)
    wps, dt = time_epochs(
        lambda: store.as_batches(args.batch, shuffle=True, seed=4),
        len(store))
    results["packed (mmap)"] = wps
    print(f"packed mmap store     : {wps:8.1f} windows/s  ({dt:.1f}s) "
          f"[training-ready bytes, np.take per field]")

    import jax
    dev_kind = jax.devices()[0].platform
    wps, dt = time_epochs(
        lambda: prefetch_to_device(
            ds.as_batches(args.batch, shuffle=True, seed=2),
            array_fields=TRAIN_FIELDS), len(ds))
    results[f"prefetch->{dev_kind}"] = wps
    print(f"prefetch    cache=0   : {wps:8.1f} windows/s  ({dt:.1f}s) "
          f"[device_put to {dev_kind}]")

    chip = 1550.0
    print(f"\nchip demand (BASELINE.md): {chip:.0f} windows/s "
          f"(x8 for a v5e slice: {8 * chip:.0f})")
    for name, wps in results.items():
        print(f"  {name:24s}: {wps / chip:6.2f} chips fed per host core")
    if tmp:
        ds.close()
        ds_hot.close()
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
