"""End-to-end production train-LOOP throughput on the real chip.

bench.py measures the jitted STEP (frontend + VAE fwd-bwd); this measures
the full `cli train` path — PackedWindowStore (raw mmap bytes) ->
prefetch_to_device -> device-side normalize -> jitted train step — and
attributes the gap between the loop rate and the step-only rate (VERDICT
round-3 item #7: "epoch windows/s >= ~90% of the bench step rate, gap
attributed"). The reference never measured its loop either; its envelope
is batch 2/GPU Lightning epochs (/root/reference/model/graph_model.py:501-511).

What it does:
  1. builds a production-shape random-coefficient dataset (the loop does
     not care what the numbers are — loader_bench.py's methodology),
  2. computes real stats, packs it into a raw-layout PackedWindowStore
     (the `cli pack-data --raw` path),
  3. runs the ACTUAL `cli train` subprocess (--device-normalize, batch
     128, wavefront_pallas, bf16 policy + bf16 moments, donate_state,
     prefetch) for a few epochs and reads windows_per_sec from the run's
     history.pkl (the fit loop's own timer: ingest + steps only —
     checkpoint/val excluded, matching what "loop rate" means),
  4. times the bare jitted train step in-process on a device-resident
     batch (steady-state, queue-then-block) for the step-only rate.

Usage: python benchmarks/train_loop_bench.py [--windows N] [--batch B]
           [--epochs E] [--schedule wavefront_pallas] [--keep DIR]
Prints one JSON line.
"""

import argparse
import glob
import json
import os
import pickle
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loader_bench import build  # noqa: E402  (same methodology, same shapes)

from vae_teb_tpu.data import (CombinedHDF5Dataset, DatasetStatsCalculator,
                              PackedWindowStore, load_stats)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=4,
                    help="must be >= 2: epoch 0 includes the jit compile "
                         "(minutes through the tunnel); the loop rate is "
                         "read from the post-compile epochs only")
    ap.add_argument("--schedule", default="wavefront_pallas")
    ap.add_argument("--steps-per-execution", type=int, default=1,
                    dest="spe",
                    help="K train steps per jitted dispatch in the fit "
                         "loop (TrainerConfig.steps_per_execution): "
                         "amortizes the per-dispatch overhead that "
                         "dominates the naive loop (BASELINE.md round-5 "
                         "loop attribution)")
    ap.add_argument("--steps", type=int, default=30,
                    help="steady-state step-only timing iterations")
    ap.add_argument("--keep", default=None,
                    help="build under this dir and keep it (default: tmp)")
    args = ap.parse_args()
    if args.epochs < 2:
        ap.error("--epochs must be >= 2 (epoch 0 includes jit compile; a "
                 "1-epoch run would report a compile-dominated loop rate)")

    tmp = None
    if args.keep:
        root = args.keep
        os.makedirs(root, exist_ok=True)
    else:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
    h5 = os.path.join(root, "train.hdf5")
    stats_path = os.path.join(root, "stats.hdf5")
    packed = os.path.join(root, "packed")

    timings = {}
    if not os.path.exists(h5):
        t0 = time.perf_counter()
        build(h5, args.windows, seed=0)
        timings["build_s"] = round(time.perf_counter() - t0, 1)
    if not os.path.exists(stats_path):
        t0 = time.perf_counter()
        calc = DatasetStatsCalculator(trim_minutes=2.0)
        calc.save_stats(calc.calculate_stats([h5]), stats_path)
        timings["stats_s"] = round(time.perf_counter() - t0, 1)
    if not os.path.isdir(packed):
        t0 = time.perf_counter()
        # stats_path=None: this is the `cli pack-data --raw` path — nothing
        # is normalized here (normalization folds into the jitted step via
        # --device-normalize), so the manifest must not claim it was
        # (round-4 advisor finding: stats_path set => "normalized": true).
        ds = CombinedHDF5Dataset(h5, stats_path=None,
                                 normalize_fields=(), trim_minutes=2.0,
                                 cache_size=0, raw_layout=True)
        PackedWindowStore.build(ds, packed, batch_size=256)
        ds.close()
        timings["pack_s"] = round(time.perf_counter() - t0, 1)
    # --keep reuse guard (round-4 advisor finding): a rerun with a
    # different --windows must not silently benchmark stale data (whether
    # the stale artifact is the packed store or the hdf5 it was built from).
    with open(os.path.join(packed, "manifest.json")) as f:
        packed_n = json.load(f)["n_windows"]
    if packed_n != args.windows:
        sys.stderr.write(
            f"kept dir holds a packed store with {packed_n} windows but "
            f"--windows={args.windows}; delete {root} or rerun with "
            f"--windows {packed_n}\n")
        return 1

    cfg_path = os.path.join(root, "cfg.yaml")
    runs = os.path.join(root, "runs")
    with open(cfg_path, "w") as f:
        f.write(f"""tag: loopbench
out_dir_base: {runs}
model:
  lstm_schedule: {args.schedule}
trainer:
  epochs: {args.epochs}
  precision: bf16
  moment_dtype: bf16
  steps_per_execution: {args.spe}
  seed: 42
dataset:
  train_paths: [{packed}]
  stat_path: {stats_path}
  batch_size: {args.batch}
""")

    # the REAL production entry point, timed by its own fit-loop clock
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "vae_teb_tpu.cli", "train", "--config",
         cfg_path, "--device-normalize", "--plot-every", "0"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        return 1
    hist_files = glob.glob(os.path.join(runs, "*", "train_results",
                                        "history.pkl"))
    with open(sorted(hist_files)[-1], "rb") as f:
        hist = pickle.load(f)
    epoch_rates = [round(r, 1) for r in hist["windows_per_sec"]]

    # step-only steady-state rate on the same resident batch (what the
    # loop rate is honestly compared against — bench.py's headline also
    # includes the frontend, which training does NOT run: it consumes
    # precomputed coefficients)
    import jax
    from vae_teb_tpu.models import SeqVaeTeb
    from vae_teb_tpu.parallel import data_parallel_mesh
    from vae_teb_tpu.train import Trainer, TrainerConfig

    store = PackedWindowStore(packed)
    norm_stats = load_stats(stats_path)
    cfg = TrainerConfig(precision="bf16", moment_dtype="bf16",
                        donate_state=True)
    mesh = data_parallel_mesh(devices=jax.devices()[:1])
    trainer = Trainer(SeqVaeTeb(dtype=cfg.model_dtype(),
                                lstm_schedule=args.schedule),
                      cfg, mesh=mesh, normalize_stats=norm_stats)
    state = trainer.init_state(store.read_batch(range(2)))
    batch = trainer._put(store.read_batch(range(args.batch)))
    # NOTE round-5: close each timing with a SCALAR FETCH, not
    # block_until_ready — the axon deferred runtime can satisfy
    # block_until_ready before the device work ran (CLAUDE.md), which
    # over-read this leg as 35k win/s in the first recorded run.
    for _ in range(3):  # compile + warm
        state, m = trainer.train_step(state, batch, beta=1e-5)
    float(np.asarray(m["total_loss"]))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = trainer.train_step(state, batch, beta=1e-5)
    float(np.asarray(m["total_loss"]))  # forces the chain via state deps
    dt = time.perf_counter() - t0
    step_rate = args.steps * args.batch / dt

    # steady-state loop rate: mean over the post-compile epochs (epoch 0
    # pays the jit compile — minutes through the tunnel)
    loop_rate = round(float(np.mean(epoch_rates[1:])), 1)
    print(json.dumps({
        "metric": "production train-loop throughput",
        "unit": "windows/sec/chip",
        "windows": args.windows, "batch": args.batch,
        "schedule": args.schedule, "steps_per_execution": args.spe,
        "epoch_rates": epoch_rates,       # epoch 0 includes compile
        "loop_rate": loop_rate,           # last-epoch fit-loop rate
        "step_only_rate": round(step_rate, 1),
        "loop_over_step": round(loop_rate / step_rate, 3),
        "train_wall_s": round(wall, 1),
        **timings,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
