"""Worker process for the 2-process multihost training test.

Launched by tests/test_multihost.py with a clean environment (no axon TPU
plugin, 4 forced CPU devices per process). Each worker joins the
distributed coordinator, builds the 8-device global mesh, trains MiniVae
for a fixed number of steps on deterministic data through
Trainer._put's `jax.make_array_from_process_local_data` path — the
reference's torchrun+DDP production mode
(/root/reference/run_train_ddp.sh:11-17,
/root/reference/model/graph_model.py:2019-2023) — and rank 0 dumps the
final parameters for comparison against the single-process 8-device run.

Not a test module; pytest ignores it (no test_ functions).
"""

import argparse
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--steps", type=int, required=True)
    p.add_argument("--global-batch", type=int, required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()

    import jax

    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert len(jax.local_devices()) == args.local_devices

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from vae_teb_tpu.parallel import data_parallel_mesh
    from vae_teb_tpu.train import Trainer, TrainerConfig

    # the same MiniVae the single-process side trains
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "mh_test_train", os.path.join(repo, "tests", "test_train.py"))
    tt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tt)

    mesh = data_parallel_mesh()  # all 8 global devices
    assert mesh.devices.size == args.num_processes * args.local_devices
    trainer = Trainer(tt.MiniVae(), TrainerConfig(lr=1e-3), mesh=mesh)

    rank, world = jax.process_index(), jax.process_count()
    local = args.global_batch // world
    rng = np.random.default_rng(0)
    init_batch = {k: v[:1] for k, v in tt.make_batch(rng, b=1).items()}
    state = trainer.init_state(init_batch)

    for step in range(args.steps):
        g = tt.make_batch(np.random.default_rng(100 + step),
                          b=args.global_batch)
        local_batch = {k: v[rank * local:(rank + 1) * local]
                       for k, v in g.items()}
        state, metrics = trainer.train_step(state, local_batch, beta=1e-5)
        loss = float(metrics["total_loss"])
        assert np.isfinite(loss), f"step {step}: non-finite loss"
        if rank == 0:
            print(f"step {step}: loss {loss:.6f}", flush=True)

    if rank == 0:
        params = jax.device_get(state.params)
        flat = {"/".join(map(str, path)): np.asarray(leaf)
                for path, leaf in
                jax.tree_util.tree_flatten_with_path(params)[0]}
        np.savez(args.out, **flat)
    # all ranks exit cleanly so the coordinator shuts down
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
