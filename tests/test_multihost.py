"""Real 2-process distributed training test.

The reference's production mode is N communicating processes
(/root/reference/run_train_ddp.sh:11-17 — torchrun --nproc_per_node=6;
/root/reference/model/graph_model.py:2019-2023 — dist.init_process_group).
This framework's equivalent is `jax.distributed.initialize` + a global
mesh; until now that path (Trainer._put's
make_array_from_process_local_data branch) had never executed with
process_count > 1. Here two coordinated OS processes with 4 forced CPU
devices each train MiniVae over the SAME global batch sequence as a
single-process 8-device run, and the final parameters must agree.

The workers run with a scrubbed environment (no axon TPU plugin on
PYTHONPATH, no JAX_PLATFORMS) so both processes get CPU-only backends.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")

STEPS = 4
GLOBAL_BATCH = 8

# test_dryrun_gate_budget ceiling: measured 147 s for _dryrun_body(2) on
# this 1-core host (2026-08-20; the 8-device driver gate measured 181 s).
GATE_BUDGET_S = 300


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = ""  # auto-select; no TPU plugin on PYTHONPATH
    env["PYTHONPATH"] = REPO
    return env


@pytest.mark.slow
@pytest.mark.multihost
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh_params.npz")
    procs = []
    logs = []
    for pid in range(2):
        log = open(tmp_path / f"worker{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--local-devices", "4",
             "--steps", str(STEPS), "--global-batch", str(GLOBAL_BATCH),
             "--out", out],
            env=_worker_env(), stdout=log, stderr=subprocess.STDOUT,
            cwd=str(tmp_path)))
    try:
        for p in procs:
            assert p.wait(timeout=600) == 0, _tail(tmp_path)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()
    assert os.path.exists(out), _tail(tmp_path)
    mh = np.load(out)

    # single-process 8-device reference run, same data
    import jax
    from test_train import MiniVae, make_batch
    from vae_teb_tpu.parallel import data_parallel_mesh
    from vae_teb_tpu.train import Trainer, TrainerConfig
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("virtual CPU device farm unavailable")
    mesh = data_parallel_mesh(devices=devs[:8])
    trainer = Trainer(MiniVae(), TrainerConfig(lr=1e-3), mesh=mesh)
    rng = np.random.default_rng(0)
    init_batch = {k: v[:1] for k, v in make_batch(rng, b=1).items()}
    state = trainer.init_state(init_batch)
    for step in range(STEPS):
        g = make_batch(np.random.default_rng(100 + step), b=GLOBAL_BATCH)
        state, metrics = trainer.train_step(state, g, beta=1e-5)
    sp = {"/".join(map(str, path)): np.asarray(leaf)
          for path, leaf in jax.tree_util.tree_flatten_with_path(
              jax.device_get(state.params))[0]}

    assert set(mh.files) == set(sp)
    for k in sp:
        np.testing.assert_allclose(
            mh[k], sp[k], rtol=0, atol=1e-6,
            err_msg=f"2-process vs 1-process mismatch in {k}")


def test_dryrun_gate_budget():
    """The driver's multichip gate must FIT ITS TIMEOUT, not just pass.

    MULTICHIP_r03 failed on environment drift; MULTICHIP_r04 was rc=124 —
    a driver-timeout kill of a correct ~20-min check. This guard runs the
    real `_dryrun_body` (tiny 2-device mesh, default cheap config) under
    the same scrubbed-env pattern `dryrun_multichip` uses and asserts a
    wall-time ceiling, so gate-budget regressions surface here instead of
    in MULTICHIP_r{N}.json. The 8-device gate itself is timed and
    recorded in BASELINE.md (round 5)."""
    import time
    env = _worker_env()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    t0 = time.monotonic()
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g._dryrun_body(2)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    wall = time.monotonic() - t0
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    # Budget: the 2-device body must stay comfortably inside the ~5-min
    # budget the 8-device driver gate targets (BASELINE.md round 5
    # records both). Bound chosen ~2x the measured wall so scheduler
    # noise doesn't flake it while a structural regression (a second
    # trainer compile, an init compile, production-size shapes) trips it.
    assert wall < GATE_BUDGET_S, (
        f"_dryrun_body(2) took {wall:.0f}s — the driver gate budget has "
        f"regressed (budget {GATE_BUDGET_S}s; see __graft_entry__ "
        "gate-budget notes)")


def _tail(tmp_path) -> str:
    msg = []
    for pid in range(2):
        p = tmp_path / f"worker{pid}.log"
        if p.exists():
            msg.append(f"--- worker{pid}.log ---\n"
                       + "\n".join(p.read_text().splitlines()[-25:]))
    return "\n".join(msg)
