"""Capture a jax.profiler device trace of the production train step and
attribute time per HLO op category (round-3 directive: attribute the
unaccounted VAE-step residual op-by-op on the real chip).

Runs the bench.py pipeline step (scattering frontend + SeqVaeTeb
fwd+bwd+AdamW, batch 32, bf16) a few times under jax.profiler with a
perfetto trace, then parses the trace JSON into a cost table grouped by op
name. Writes the table to stdout and benchmarks/trace_table.txt.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_trace.py
       [--fp32] [--batch N] [--steps K]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def build_step(B, model_dtype):
    import jax
    import jax.numpy as jnp
    import optax
    from vae_teb_tpu.models import SeqVaeTeb
    from vae_teb_tpu.ops import PhaseScattering1D

    N, trim = 5760, 30
    sc = PhaseScattering1D(J=11, Q=4, T=16, shape=N, max_order=1)
    sel = sc.optimal_fhr_selection()
    phase_idx = tuple(int(i) for i in sel["phase_selection"]["selected_indices"])
    cross_idx = tuple(int(i) for i in sel["cross_selection"]["selected_indices"])
    S = sc.scattering.n_out - 2 * trim

    model = SeqVaeTeb(dtype=model_dtype)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "sample": rng},
        jnp.zeros((1, S, 43)), jnp.zeros((1, S, 44)), jnp.zeros((1, S, 130)),
        train=False)
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adamw(1e-4, weight_decay=1e-4))

    def frontend(fhr, up):
        out = sc._analyze(fhr, up, phase_subset=phase_idx,
                          cross_subset=cross_idx)
        sl = slice(trim, sc.scattering.n_out - trim)
        y_st = jnp.swapaxes(out["scattering"][:, :, sl], 1, 2)
        y_ph = jnp.swapaxes(out["phase_corr"][:, :, sl], 1, 2)
        x_ph = jnp.swapaxes(out["cross_phase_corr"][:, :, sl], 1, 2)
        return y_st, y_ph, x_ph

    @jax.jit
    def pipeline_step(carry, i, fhr, up, raw):
        params, batch_stats, opt_state = carry
        key = jax.random.fold_in(jax.random.PRNGKey(1), i)
        y_st, y_ph, x_ph = frontend(fhr, up)

        def loss_fn(p):
            outs, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                y_st, y_ph, x_ph, train=True, rngs={"sample": key},
                mutable=["batch_stats"])
            losses = model.compute_loss(outs, y_st, y_ph, raw, beta=1e-5)
            return losses["total_loss"], upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, upd["batch_stats"], opt_state), loss

    rng_np = np.random.default_rng(0)
    fhr = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))
    up = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))
    raw = jnp.asarray(rng_np.standard_normal((B, 4800)).astype(np.float32))
    carry0 = (variables["params"], variables["batch_stats"],
              tx.init(variables["params"]))
    return partial(pipeline_step, fhr=fhr, up=up, raw=raw), carry0


CATEGORIES = (
    # (label, name substrings) — first match wins
    ("lstm scan fwd", ("while", "scan")),
    ("matmul/dot", ("dot", "gemm", "matmul")),
    ("convolution", ("conv",)),
    ("fusion (elementwise/reduce)", ("fusion", "loop_")),
    ("copy/transpose/reshape", ("copy", "transpose", "reshape", "bitcast")),
    ("allreduce/collective", ("all-reduce", "collective")),
    ("dynamic slice/update", ("dynamic",)),
    ("rng", ("rng",)),
)


def categorize(name: str) -> str:
    low = name.lower()
    for label, keys in CATEGORIES:
        if any(k in low for k in keys):
            return label
    return "other"


def parse_perfetto(trace_dir):
    """Aggregate device-track slice durations by op name from the perfetto
    JSON trace."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.json.gz"),
                      recursive=True)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # device tracks: pid names containing TPU / device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    by_name = defaultdict(float)
    count = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if not any(t in pname.lower() for t in ("tpu", "device", "xla")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[e.get("name", "?")] += dur
        count[e.get("name", "?")] += 1
    return by_name, count, path


def main():
    import jax
    import jax.numpy as jnp

    B = 32
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    steps = 6
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    dtype = None if "--fp32" in sys.argv else jnp.bfloat16

    step, carry = build_step(B, dtype)
    # warm up / compile outside the trace
    carry2, loss = step(carry, jnp.int32(0))
    float(np.asarray(loss))

    trace_dir = "/tmp/jaxtrace"
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    c = carry
    for i in range(steps):
        c, loss = step(c, jnp.int32(i))
        float(np.asarray(loss))  # force completion inside the trace window
    jax.profiler.stop_trace()
    print(f"trace captured to {trace_dir} (steps={steps}, batch={B})")

    parsed = parse_perfetto(trace_dir)
    if parsed is None:
        print("no perfetto json found; raw artifacts:",
              os.listdir(trace_dir))
        return
    by_name, count, path = parsed
    total = sum(by_name.values())
    lines = [f"perfetto source: {path}",
             f"total device time: {total:.2f} ms over {steps} steps "
             f"({total / steps:.2f} ms/step)", "",
             f"{'op':60s} {'calls':>6s} {'ms':>9s} {'ms/step':>8s} {'%':>6s}"]
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        lines.append(f"{name[:60]:60s} {count[name]:6d} {ms:9.3f} "
                     f"{ms / steps:8.3f} {100 * ms / total:6.2f}")
    lines.append("")
    by_cat = defaultdict(float)
    for name, ms in by_name.items():
        by_cat[categorize(name)] += ms
    lines.append(f"{'category':35s} {'ms/step':>9s} {'%':>6s}")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        lines.append(f"{cat:35s} {ms / steps:9.3f} {100 * ms / total:6.2f}")
    report = "\n".join(lines)
    print(report)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "trace_table.txt")
    with open(out, "w") as f:
        f.write(report + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
