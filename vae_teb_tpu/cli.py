"""Command-line entry point: train / evaluate / build-data / stats.

Replaces the reference's __main__ mode literals and torchrun launcher
(/root/reference/model/graph_model.py:1873-2158, run_train_ddp.sh) with a
real CLI over the typed RunConfig. Data parallelism needs no process
launcher: the jitted train step spans every local device through the mesh
(multi-host would add jax.distributed.initialize, parallel/mesh.py).

    python -m vae_teb_tpu.cli train  --config config.yaml
    python -m vae_teb_tpu.cli test   --config config.yaml --checkpoint DIR
    python -m vae_teb_tpu.cli build-data --out data.h5 --records 64
    python -m vae_teb_tpu.cli stats  --data data.h5 --out stats.h5
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
from typing import Optional

import numpy as np


def _make_model(cfg):
    from .models import SeqVaeTeb
    m = cfg.model
    return SeqVaeTeb(latent_dim_source=m.latent_dim_source,
                     latent_dim_target=m.latent_dim_target,
                     latent_dim_z=m.latent_dim_z,
                     input_channels=m.input_channels,
                     n_scattering=m.n_scattering, n_phase=m.n_phase,
                     decimation_factor=m.decimation_factor,
                     warmup_period=m.warmup_period,
                     lstm_schedule=m.lstm_schedule,
                     dtype=cfg.trainer.model_dtype())


def _loaders(cfg, split: str, raw: bool = False):
    """raw=True: on-disk (C, S) layout, no host normalization — the
    Trainer(normalize_stats=...) on-device path (2.5x ingest throughput).

    A path that is a directory holding a packed-store manifest loads as a
    memory-mapped PackedWindowStore (training-ready bytes, no per-epoch
    decompression/normalization — the multi-chip ingest path)."""
    from .data import CombinedHDF5Dataset, PackedWindowStore
    ds_cfg = cfg.dataset
    paths = {"train": ds_cfg.train_paths, "val": ds_cfg.validation_paths,
             "test": ds_cfg.test_paths}[split]
    if not paths:
        return None
    if len(paths) == 1 and os.path.isdir(paths[0]):
        store = PackedWindowStore(paths[0])
        packed_raw = bool(store.meta.get("raw_layout"))
        if packed_raw != raw:
            raise ValueError(
                f"packed store {paths[0]} was built with raw_layout="
                f"{packed_raw} but this run needs raw={raw} "
                "(--device-normalize expects a store packed with --raw; a "
                "normalized store must run without it)")
        return store
    return CombinedHDF5Dataset(
        paths, stats_path=ds_cfg.stat_path,
        normalize_fields=() if raw else ds_cfg.normalize_fields,
        trim_minutes=ds_cfg.trim_minutes, decimation=ds_cfg.decimation,
        cache_size=ds_cfg.cache_size, raw_layout=raw)


def cmd_train(args) -> int:
    from .train import (Checkpointer, HistoryCallback, LossCurveCallback,
                        MemoryMonitorCallback, ReconstructionPlotCallback,
                        Trainer, load_config)
    from .utils import get_logger, setup_logging

    import jax

    if getattr(args, "multihost", False):
        # one controller per host over a DCN-connected slice; the mesh then
        # spans global devices and XLA routes the gradient all-reduce over
        # ICI within slices and DCN across them (SURVEY.md §5.8's target
        # topology; the reference's torchrun+NCCL equivalent)
        jax.distributed.initialize()
    rank = jax.process_index()
    world = jax.process_count()

    cfg = load_config(args.config, root=args.root)
    run_dir = cfg.run_dir()
    setup_logging(os.path.join(run_dir, "train_results",
                               f"train.log" if world == 1
                               else f"train_rank{rank}.log"))
    log = get_logger()
    log.info("run dir: %s (process %d/%d)", run_dir, rank, world)

    device_norm = bool(getattr(args, "device_normalize", False))
    norm_stats = None
    if device_norm:
        if not cfg.dataset.stat_path:
            log.error("--device-normalize needs dataset.stat_path")
            return 2
        from .data import load_stats
        norm_stats = load_stats(cfg.dataset.stat_path)
        if cfg.dataset.normalize_fields is not None:
            norm_stats = {k: v for k, v in norm_stats.items()
                          if k in cfg.dataset.normalize_fields}
    train_ds = _loaders(cfg, "train", raw=device_norm)
    val_ds = _loaders(cfg, "val", raw=device_norm)
    if train_ds is None:
        log.error("no train_paths configured")
        return 2

    model = _make_model(cfg)
    mesh = None
    tp = getattr(args, "model_parallel", 1)
    if tp > 1:
        # hybrid (data, model) mesh: wide decoder-head kernels +
        # same-shaped optimizer moments shard over 'model'
        # (parallel.mesh.tensor_parallel_rule); everything else stays DP
        from .parallel import hybrid_mesh
        n = len(jax.devices())
        if n % tp:
            log.error("--model-parallel %d does not divide %d devices",
                      tp, n)
            return 2
        mesh = hybrid_mesh(n // tp, tp)
    # production loop rebinds state every step, so donate the old one:
    # params + moments update in place instead of double-buffering ~0.8 GB
    cfg.trainer.donate_state = True
    trainer = Trainer(model, cfg.trainer, mesh=mesh,
                      normalize_stats=norm_stats)
    bs = cfg.dataset.batch_size
    n_dev = trainer.mesh.devices.size
    global_bs = bs * n_dev
    log.info("devices=%d per-device-batch=%d global-batch=%d precision=%s "
             "accumulate=%d", n_dev, bs, global_bs, cfg.trainer.precision,
             cfg.trainer.accumulate_grad_batches)

    state = trainer.init_state(train_ds.read_batch(range(min(2, len(train_ds)))))
    ckpt_dir = os.path.join(run_dir, "model_checkpoints")
    ckpt = Checkpointer(ckpt_dir, keep=cfg.checkpoints.keep)

    # mid-training resume (the reference reloads checkpoints at model build,
    # graph_model.py:337-350; here the FULL TrainState — params, batch
    # stats, optimizer state, rng, step — comes back, plus the history)
    start_epoch = 0
    history_path = os.path.join(run_dir, "train_results", "history.pkl")
    if args.resume:
        resume_dir = args.resume if isinstance(args.resume, str) else ckpt_dir
        resume_ckpt = Checkpointer(resume_dir, keep=cfg.checkpoints.keep)
        latest = resume_ckpt.latest()
        if latest is None:
            log.warning("--resume given but %s has no checkpoints; "
                        "starting fresh", resume_dir)
        else:
            state = trainer.replicate(resume_ckpt.restore(state))
            start_epoch = int(latest["step"]) + 1
            log.info("resumed from %s (epoch %d, metric %s)",
                     latest["path"], latest["step"], latest["metric"])
            if os.path.exists(history_path):
                with open(history_path, "rb") as f:
                    trainer.history = pickle.load(f)

    # per-process batch: each host iterates its disjoint shard of every
    # epoch and contributes local_bs rows of the global batch
    local_bs = global_bs // world

    def train_batches(epoch):
        return train_ds.as_batches(local_bs, shuffle=True, seed=epoch,
                                   shard_index=rank, shard_count=world)

    def val_batches(epoch):
        if val_ds is None:
            return iter(())
        # multi-host: shard validation too, and drop ragged tails so every
        # process contributes equal-shape slices to the global array
        return val_ds.as_batches(cfg.dataset.eval_batch_size, shuffle=False,
                                 drop_last=world > 1,
                                 shard_index=rank, shard_count=world)

    # plotting/history callbacks run on rank 0 only (the reference's
    # callbacks are likewise rank-0, pytorch_lightning_modules.py:100)
    callbacks = [] if rank else [
        HistoryCallback(history_path),
        LossCurveCallback(os.path.join(run_dir, "train_results",
                                       "loss_curves.png")),
    ]
    # HBM watcher runs on EVERY rank: each process can only see its own
    # devices (reference MemoryMonitorCallback polls all local GPUs,
    # pytorch_lightning_modules.py:567-638)
    callbacks.append(MemoryMonitorCallback(log_fn=log.warning))
    if not rank and val_ds is not None and len(val_ds) and args.plot_every > 0:
        plot_batch = val_ds.read_batch(range(min(2, len(val_ds))))
        if norm_stats is not None:
            # the plot callback applies the model directly, so materialize
            # the model layout (normalize + transpose) on host once
            from .data.normalize import normalize_field_inplace
            for k in ("fhr_st", "fhr_ph", "fhr_up_ph"):
                v = plot_batch[k].copy()
                if k in norm_stats:
                    v = normalize_field_inplace(v, k, norm_stats[k],
                                                channel_axis=-2)
                plot_batch[k] = np.ascontiguousarray(np.swapaxes(v, 1, 2))
            if "fhr" in norm_stats:
                plot_batch["fhr"] = normalize_field_inplace(
                    plot_batch["fhr"].copy(), "fhr", norm_stats["fhr"])
        callbacks.append(ReconstructionPlotCallback(
            os.path.join(run_dir, "train_results", "reconstructions"),
            plot_batch, every=args.plot_every))

    state = trainer.fit(state, train_batches,
                        val_batches if val_ds is not None else None,
                        checkpointer=ckpt, log_fn=log.info,
                        callbacks=callbacks, start_epoch=start_epoch)
    log.info("training complete: best checkpoint %s", ckpt.best())
    return 0


def cmd_test(args) -> int:
    import jax
    from .data import CombinedHDF5Dataset, load_stats
    from .eval import ModelEvaluator, run_evaluation_suite
    from .ops import PhaseScattering1D
    from .train import Checkpointer, Trainer, load_config
    from .utils import get_logger, setup_logging

    cfg = load_config(args.config, root=args.root)
    run_dir = cfg.run_dir()
    out_dir = os.path.join(run_dir, "test_results")
    setup_logging(os.path.join(out_dir, "test.log"))
    log = get_logger()

    test_ds = _loaders(cfg, "test") or _loaders(cfg, "val")
    if test_ds is None:
        log.error("no test/validation paths configured")
        return 2

    model = _make_model(cfg)
    trainer = Trainer(model, cfg.trainer)
    state = trainer.init_state(test_ds.read_batch(range(min(2, len(test_ds)))))
    ckpt_dir = args.checkpoint or cfg.checkpoints.test_checkpoint_path
    if ckpt_dir:
        ckpt = Checkpointer(ckpt_dir, keep=cfg.checkpoints.keep)
        state = trainer.replicate(ckpt.restore(state, best=True))
        log.info("restored best checkpoint from %s", ckpt_dir)
    else:
        log.warning("no checkpoint given: evaluating a fresh model")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    scattering = None
    stats = None
    raw_ds = None
    if args.with_scattering:
        import jax.numpy as jnp
        scattering = PhaseScattering1D(
            J=11, Q=4, T=16, shape=5760, max_order=1,
            correlation_dtype=jnp.bfloat16 if args.bf16_frontend else None,
            reduced_rate=args.reduced_frontend)
        if cfg.dataset.stat_path:
            stats = load_stats(cfg.dataset.stat_path)
        raw_paths = cfg.dataset.test_paths or cfg.dataset.validation_paths
        raw_ds = CombinedHDF5Dataset(
            raw_paths, stats_path=cfg.dataset.stat_path,
            normalize_fields=("fhr_st", "fhr_ph", "fhr_up_ph"),
            cache_size=0, allow_stats_trim_mismatch=True)
    sel_subset = None
    if scattering is not None:
        sel = scattering.optimal_fhr_selection()
        sel_subset = sel["cross_selection"]["selected_indices"]

    evaluator = ModelEvaluator(model, variables, scattering=scattering,
                               stats=stats, cross_subset=sel_subset)
    results = run_evaluation_suite(
        evaluator, test_ds, out_dir, raw_dataset=raw_ds,
        num_samples=args.num_samples,
        run_shift_analysis=args.with_scattering,
        run_gain_sweep=args.with_scattering)
    log.info("evaluation artifacts in %s", out_dir)
    m = results["metrics"]
    log.info("VAF %.4f+-%.4f  MSE %.5f  SNR %.2f dB  TE %.5f",
             m["vaf"].mean(), m["vaf"].std(), m["mse"].mean(),
             m["snr_db"].mean(), m["kld"].mean())
    return 0


def cmd_export(args) -> int:
    """Lower a trained checkpoint to a serving artifact (StableHLO via
    jax.export): the deployment path the reference lacks (its test/predict
    entries re-instantiate the torch module in Python). See serve.py."""
    import numpy as np

    from . import serve
    from .train import Checkpointer, Trainer, load_config

    cfg = load_config(args.config, root=args.root)
    model = _make_model(cfg)
    s = args.seq_len
    b = args.static_batch or 1
    batch = {
        "fhr_st": np.zeros((b, s, 43), np.float32),
        "fhr_ph": np.zeros((b, s, 44), np.float32),
        "fhr_up_ph": np.zeros((b, s, 130), np.float32),
        "fhr": np.zeros((b, s * 16), np.float32),
    }
    trainer = Trainer(model, cfg.trainer)
    state = trainer.init_state(batch)
    ckpt_dir = args.checkpoint or cfg.checkpoints.test_checkpoint_path
    if ckpt_dir:
        state = Checkpointer(ckpt_dir, keep=cfg.checkpoints.keep).restore(
            state, best=True)
    else:
        print("warning: no checkpoint given, exporting fresh weights")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    platforms = args.platforms.split(",") if args.platforms else None
    if args.stream:
        exp = serve.export_source_stream(
            model, variables, batch_size=b, chunk_len=args.chunk_len,
            platforms=platforms, bundle_params=args.bundle_params)
    else:
        exp = serve.export_inference(
            model, variables, batch,
            batch_polymorphic=args.static_batch is None,
            platforms=platforms, bundle_params=args.bundle_params)
    n = serve.save_artifact(exp, args.out)
    kind = "stream step" if args.stream else "inference"
    print(f"exported {kind} ({n / 1e6:.1f} MB, platforms="
          f"{platforms or 'host default'}) -> {args.out}")
    return 0


def cmd_build_data(args) -> int:
    from .data import (DatasetStatsCalculator, build_dataset,
                       build_dataset_from_records, synthetic_records)
    transform = None
    if args.bf16_frontend or args.reduced_frontend:
        import jax.numpy as jnp
        from .ops import PhaseScattering1D
        transform = PhaseScattering1D(
            J=args.J, Q=args.Q, T=args.T, shape=args.len_signal, max_order=1,
            correlation_dtype=jnp.bfloat16 if args.bf16_frontend else None,
            reduced_rate=args.reduced_frontend)
    if args.record_len:
        # long-record ingest: block each record into overlapping windows
        # (the reference ETL's base_block_size / 0.5-overlap contract)
        res = build_dataset_from_records(
            args.out,
            synthetic_records(args.records, args.record_len, seed=args.seed),
            J=args.J, Q=args.Q, T=args.T, window=args.len_signal,
            overlap=args.overlap, transform=transform)
    else:
        res = build_dataset(args.out, n_records=args.records,
                            windows_per_record=args.windows,
                            len_signal=args.len_signal, seed=args.seed,
                            J=args.J, Q=args.Q, T=args.T,
                            transform=transform)
    print(f"built {args.out}: {res}")
    if args.stats_out:
        calc = DatasetStatsCalculator(trim_minutes=args.trim_minutes)
        stats = calc.calculate_stats([args.out])
        calc.save_stats(stats, args.stats_out)
        print(f"stats written to {args.stats_out}")
    return 0


def cmd_stats(args) -> int:
    from .data import DatasetStatsCalculator
    calc = DatasetStatsCalculator(trim_minutes=args.trim_minutes)
    stats = calc.calculate_stats(args.data)
    calc.save_stats(stats, args.out)
    print(f"stats over {len(args.data)} file(s) written to {args.out}")
    return 0


def cmd_pack_data(args) -> int:
    """Materialize HDF5 dataset(s) into a memory-mapped packed window
    store: trimmed/normalized/layout-ready fp32 bytes read per epoch via
    np.memmap with zero per-sample work — the ingest path that feeds a
    multi-chip slice (~12.4k windows/s demand at 8 x v5e) from one host."""
    from .data import CombinedHDF5Dataset, PackedWindowStore
    ds = CombinedHDF5Dataset(
        args.data, stats_path=args.stats,
        normalize_fields=() if args.raw else None,
        trim_minutes=args.trim_minutes, decimation=args.decimation,
        cache_size=0, raw_layout=args.raw)
    store = PackedWindowStore.build(ds, args.out, batch_size=args.batch_size)
    size = sum(os.path.getsize(os.path.join(args.out, f))
               for f in os.listdir(args.out))
    print(f"packed {len(store)} windows ({size / 1e6:.0f} MB, fields "
          f"{','.join(store.fields)}, raw_layout={args.raw}) -> {args.out}")
    ds.close()
    return 0


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(prog="vae_teb_tpu",
                                description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="command", required=True)

    pt = sub.add_parser("train", help="train the SeqVaeTeb model")
    pt.add_argument("--config", required=True)
    pt.add_argument("--root", default=None,
                    help="root for relative dataset paths")
    pt.add_argument("--resume", nargs="?", const=True, default=False,
                    metavar="CKPT_DIR",
                    help="resume from the latest checkpoint (optionally "
                         "from an explicit checkpoint directory)")
    pt.add_argument("--device-normalize", action="store_true",
                    dest="device_normalize",
                    help="fold log/asinh/z-score normalization into the "
                         "compiled train step (XLA fuses it for ~free) and "
                         "feed raw-layout batches: the host loader only "
                         "decompresses bytes (2.5x ingest throughput)")
    pt.add_argument("--model-parallel", type=int, default=1,
                    dest="model_parallel", metavar="N",
                    help="shard the wide decoder heads over N devices "
                         "(hybrid data x model mesh); default pure DP")
    pt.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize() first: one process "
                         "per host across a multi-slice TPU pod; data is "
                         "sharded per process, gradients all-reduce over "
                         "ICI/DCN")
    pt.add_argument("--plot-every", type=int, default=10,
                    help="epochs between val-reconstruction plots "
                         "(0 disables)")
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("test", help="run the evaluation suite")
    pe.add_argument("--config", required=True)
    pe.add_argument("--root", default=None)
    pe.add_argument("--checkpoint", default=None)
    pe.add_argument("--num-samples", type=int, default=50)
    pe.add_argument("--bf16-frontend", action="store_true",
                    help="bf16 correlation stage in the recompute frontend "
                         "(the bench/production throughput mode; coefficient "
                         "error budget in BASELINE.md)")
    pe.add_argument("--reduced-frontend", action="store_true",
                    help="reduced-rate pair pipeline (ops.phase_reduced; "
                         "error inside the fp32 implementation spread vs "
                         "the fp64 oracle)")
    pe.add_argument("--with-scattering", action="store_true",
                    help="enable shift/gain analyses (on-device scattering)")
    pe.set_defaults(fn=cmd_test)

    px = sub.add_parser("export",
                        help="lower a checkpoint to a StableHLO serving "
                             "artifact (jax.export)")
    px.add_argument("--config", required=True)
    px.add_argument("--root", default=None)
    px.add_argument("--checkpoint", default=None)
    px.add_argument("--out", required=True, help="artifact file path")
    px.add_argument("--seq-len", type=int, default=300,
                    help="decimated sequence length (default: production "
                         "300)")
    px.add_argument("--static-batch", type=int, default=None, metavar="B",
                    help="export at a fixed batch size (default: symbolic "
                         "batch — one artifact serves every size)")
    px.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu (cross-lowering; "
                         "default: this host's platform)")
    px.add_argument("--bundle-params", action="store_true",
                    help="bake the weights into the artifact (self-"
                         "contained file) instead of taking them as an "
                         "argument")
    px.add_argument("--stream", action="store_true",
                    help="export the incremental source-encode step "
                         "instead of the full forward")
    px.add_argument("--chunk-len", type=int, default=1,
                    help="chunk length for --stream (default 1: per-"
                         "timestep serving)")
    px.set_defaults(fn=cmd_export)

    pb = sub.add_parser("build-data", help="build a synthetic dataset")
    pb.add_argument("--out", required=True)
    pb.add_argument("--records", type=int, default=16)
    pb.add_argument("--windows", type=int, default=4)
    pb.add_argument("--len-signal", type=int, default=5760)
    pb.add_argument("--record-len", type=int, default=0,
                    help="generate records of this length and window them "
                         "into --len-signal windows (0 = one window per "
                         "record, no blocking)")
    pb.add_argument("--overlap", type=float, default=0.5,
                    help="window overlap fraction for --record-len mode")
    pb.add_argument("--seed", type=int, default=0)
    pb.add_argument("--J", type=int, default=11)
    pb.add_argument("--Q", type=int, default=4)
    pb.add_argument("--T", type=int, default=16)
    pb.add_argument("--bf16-frontend", action="store_true",
                    help="bf16 correlation stage in the ETL frontend "
                         "(throughput mode; default = exact fp32/HIGHEST)")
    pb.add_argument("--reduced-frontend", action="store_true",
                    help="reduced-rate pair pipeline in the ETL frontend "
                         "(throughput mode, oracle-bounded error)")
    pb.add_argument("--stats-out", default=None)
    pb.add_argument("--trim-minutes", type=float, default=2.0)
    pb.set_defaults(fn=cmd_build_data)

    ps = sub.add_parser("stats", help="compute normalization statistics")
    ps.add_argument("--data", nargs="+", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--trim-minutes", type=float, default=None)
    ps.set_defaults(fn=cmd_stats)

    pp = sub.add_parser("pack-data",
                        help="materialize HDF5 dataset(s) into a memory-"
                             "mapped training-ready packed window store")
    pp.add_argument("--data", nargs="+", required=True,
                    help="source HDF5 file(s)")
    pp.add_argument("--out", required=True, help="output directory")
    pp.add_argument("--stats", default=None,
                    help="normalization stats file (omit with --raw)")
    pp.add_argument("--trim-minutes", type=float, default=None)
    pp.add_argument("--decimation", type=int, default=16)
    pp.add_argument("--batch-size", type=int, default=64,
                    help="build streaming batch (bounds peak memory)")
    pp.add_argument("--raw", action="store_true",
                    help="pack raw (C, S) un-normalized bytes for "
                         "--device-normalize training")
    pp.set_defaults(fn=cmd_pack_data)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
