"""Attribute the fit-loop vs step-only gap stage by stage (round 5).

train_loop_bench measured the production `cli train` loop at ~120 win/s
against a multi-thousand step-only rate. This probe rebuilds the loop
from its real pieces (PackedWindowStore -> as_batches(shuffle) ->
prefetch_to_device -> Trainer.train_step, identical config) and times:

  host:     iterate batches, touch arrays, no device work
  put:      + device_put into the batch sharding (blocked per batch)
  steps:    + the jitted train step, metrics kept on device, ONE
            jax.device_get of the whole metric list at epoch end
            (what fit does via np.mean per key, but batched)
  steps_npmean: same but fetching exactly like fit's
            `float(np.mean([m[k] for m in ...]))` per-key-per-step
            np conversions (many tiny tunnel round trips)

Usage: python benchmarks/loop_gap_probe.py [--windows 2048] [--batch 128]
       [--keep DIR]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from loader_bench import build  # noqa: E402

from vae_teb_tpu.data import (CombinedHDF5Dataset, DatasetStatsCalculator,
                              PackedWindowStore, load_stats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--keep", default="/tmp/loop_gap_probe")
    args = ap.parse_args()

    root = args.keep
    os.makedirs(root, exist_ok=True)
    h5 = os.path.join(root, "train.hdf5")
    stats_path = os.path.join(root, "stats.hdf5")
    packed = os.path.join(root, "packed")
    if not os.path.exists(h5):
        build(h5, args.windows, seed=0)
    if not os.path.exists(stats_path):
        calc = DatasetStatsCalculator(trim_minutes=2.0)
        calc.save_stats(calc.calculate_stats([h5]), stats_path)
    if not os.path.isdir(packed):
        ds = CombinedHDF5Dataset(h5, stats_path=None, normalize_fields=(),
                                 trim_minutes=2.0, cache_size=0,
                                 raw_layout=True)
        PackedWindowStore.build(ds, packed, batch_size=256)
        ds.close()

    import jax
    from vae_teb_tpu.models import SeqVaeTeb
    from vae_teb_tpu.parallel import batch_sharding, data_parallel_mesh
    from vae_teb_tpu.train import Trainer, TrainerConfig
    from vae_teb_tpu.data.dataset import prefetch_to_device

    store = PackedWindowStore(packed)
    norm_stats = load_stats(stats_path)
    cfg = TrainerConfig(precision="bf16", moment_dtype="bf16",
                        donate_state=True)
    mesh = data_parallel_mesh(devices=jax.devices()[:1])
    trainer = Trainer(SeqVaeTeb(dtype=cfg.model_dtype(),
                                lstm_schedule="wavefront_pallas"),
                      cfg, mesh=mesh, normalize_stats=norm_stats)
    state = trainer.init_state(store.read_batch(range(2)))
    sh = batch_sharding(mesh)
    fields = ("fhr_st", "fhr_ph", "fhr_up_ph", "fhr")

    def batches(epoch):
        return store.as_batches(args.batch, shuffle=True, seed=epoch)

    out = {}

    # --- host-only -------------------------------------------------------
    for e in range(2):  # epoch 0 warms the page cache
        t0 = time.perf_counter()
        n = 0
        for b in batches(e):
            n += sum(int(np.asarray(b[k]).flat[0] == np.inf) for k in fields)
        dt = time.perf_counter() - t0
    out["host_s_per_epoch"] = round(dt, 3)

    # --- + device_put ----------------------------------------------------
    t0 = time.perf_counter()
    for b in batches(0):
        put = {k: jax.device_put(np.asarray(b[k]), sh) for k in fields}
    jax.block_until_ready(put)
    out["host_plus_put_s_per_epoch"] = round(time.perf_counter() - t0, 3)

    # --- + train step, batched metric fetch ------------------------------
    # compile first
    for b in batches(0):
        state, m = trainer.train_step(state, b, beta=1e-5)
        break
    jax.device_get(m)
    times = []
    for e in range(args.epochs):
        t0 = time.perf_counter()
        ms = []
        it = prefetch_to_device(batches(e), size=cfg.prefetch, sharding=sh,
                                array_fields=fields)
        for b in it:
            state, m = trainer.train_step(state, b, beta=1e-5)
            ms.append(m)
        all_m = jax.device_get(ms)  # ONE bulk fetch
        avg = {k: float(np.mean([mm[k] for mm in all_m])) for k in all_m[0]}
        times.append(time.perf_counter() - t0)
    out["steps_bulkfetch_s_per_epoch"] = round(min(times), 3)
    out["loss"] = round(avg["total_loss"], 4)

    # --- + fit-style per-key np.mean fetch -------------------------------
    times = []
    for e in range(args.epochs):
        t0 = time.perf_counter()
        ms = []
        it = prefetch_to_device(batches(e), size=cfg.prefetch, sharding=sh,
                                array_fields=fields)
        for b in it:
            state, m = trainer.train_step(state, b, beta=1e-5)
            ms.append(m)
        avg = {k: float(np.mean([mm[k] for mm in ms])) for k in ms[0]}
        times.append(time.perf_counter() - t0)
    out["steps_npmean_s_per_epoch"] = round(min(times), 3)

    n_steps = args.windows // args.batch
    out.update(windows=args.windows, batch=args.batch, steps=n_steps,
               win_per_s_bulkfetch=round(
                   args.windows / out["steps_bulkfetch_s_per_epoch"], 1),
               win_per_s_npmean=round(
                   args.windows / out["steps_npmean_s_per_epoch"], 1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
