"""Capture a jax.profiler device trace of the production train step and
attribute time per HLO op category (round-3 directive: attribute the
unaccounted VAE-step residual op-by-op on the real chip).

Runs the bench.py pipeline step (scattering frontend + SeqVaeTeb
fwd+bwd+AdamW, batch 32, bf16) a few times under jax.profiler with a
perfetto trace, then parses the trace JSON into a cost table grouped by op
name. Writes the table to stdout and benchmarks/trace_table.txt.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_trace.py
       [--fp32] [--batch N] [--steps K] [--schedule S]
       [--reduced-frontend] [--fp32-frontend]

Round-5 note: pass `--schedule wavefront` when tracing — profiler traces
of programs containing pallas custom calls inflate every op ~10-20x on
axon (CLAUDE.md); the pallas recurrence is A/B'd by scan-differenced
timing instead. `--reduced-frontend` mirrors the round-5 bench default
(reduced-rate + bf16 correlation stage).
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
    corr_dtype = (jnp.bfloat16 if model_dtype is not None
                  and "--fp32-frontend" not in sys.argv else None)
    sc = PhaseScattering1D(J=11, Q=4, T=16, shape=N, max_order=1,
                           correlation_dtype=corr_dtype,
                           reduced_rate="--reduced-frontend" in sys.argv)
    sel = sc.optimal_fhr_selection()
    phase_idx = tuple(int(i) for i in sel["phase_selection"]["selected_indices"])
    cross_idx = tuple(int(i) for i in sel["cross_selection"]["selected_indices"])
    S = sc.scattering.n_out - 2 * trim

    # mirror bench.py's production step: LSTM schedule + fused optimizer
    schedule = "wavefront_pallas"
    if "--schedule" in sys.argv:
        schedule = sys.argv[sys.argv.index("--schedule") + 1]
    model = SeqVaeTeb(dtype=model_dtype, lstm_schedule=schedule)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "sample": rng},
        jnp.zeros((1, S, 43)), jnp.zeros((1, S, 44)), jnp.zeros((1, S, 130)),
        train=False)
    from vae_teb_tpu.train.schedules import make_optimizer
    tx = make_optimizer(1e-4, 0.5, 1e-4, moment_dtype=jnp.bfloat16,
                        fuse_small_params=True)

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


def label_of(name: str, args: dict) -> str:
    """Human label: hlo_category plus the parameter/op the HLO long_name
    points at (the fusion numbers alone are meaningless)."""
    import re
    cat = args.get("hlo_category", "?")
    long = args.get("long_name", "")
    hint = ""
    m = re.search(r"%carry_\w*?__([a-zA-Z0-9_]+?)__\.", long)
    if not m:
        m = re.search(r"%carry_\d+___(\w+?)__\.", long)
    if m:
        hint = m.group(1)
    else:
        shapes = re.findall(r"(?:f32|bf16)\[([\d,]+)\]", long)
        if shapes:
            hint = "shape " + "x".join(shapes[:2])
    return f"{name} [{cat}{': ' + hint if hint else ''}]"


def parse_perfetto(trace_dir):
    """Aggregate XLA-Ops-track slice durations by op from the perfetto JSON.

    Only the device pid's "XLA Ops" thread carries per-HLO-op slices; the
    "Steps"/"XLA Modules" threads are enclosing spans and would double-count.
    """
    paths = glob.glob(os.path.join(trace_dir, "**", "*.json.gz"),
                      recursive=True)
    paths = [p for p in paths if "perfetto" in os.path.basename(p)]
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_name = defaultdict(float)
    count = defaultdict(int)
    cats = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if "device" not in pid_names.get(e.get("pid"), "").lower():
            continue
        if tid_names.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        name = e.get("name", "?")
        by_name[name] += e.get("dur", 0) / 1e3  # us -> ms
        count[name] += 1
        if name not in cats and e.get("args"):
            cats[name] = (e["args"].get("hlo_category", "other"),
                          label_of(name, e["args"]))
    return by_name, count, cats, path


def main():
    B = 32
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    steps = 6
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    trace_dir = "/tmp/jaxtrace"

    if "--parse-only" not in sys.argv:
        import jax
        import jax.numpy as jnp
        dtype = None if "--fp32" in sys.argv else jnp.bfloat16
        step, carry = build_step(B, dtype)
        print("built step; compiling (tunnel compile ~2-3 min)...", flush=True)
        # warm up / compile outside the trace
        carry2, loss = step(carry, jnp.int32(0))
        float(np.asarray(loss))
        print("compiled; tracing...", flush=True)
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
    by_name, count, cats, path = parsed
    total = sum(by_name.values())
    lines = [f"perfetto source: {path}",
             f"total XLA-op device time: {total:.2f} ms over {steps} steps "
             f"({total / steps:.2f} ms/step; op sum can exceed the wall "
             "step when DMA/compute overlap)", "",
             f"{'op':72s} {'calls':>6s} {'ms/step':>8s} {'%':>6s}"]
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        label = cats.get(name, ("other", name))[1]
        lines.append(f"{label[:72]:72s} {count[name]:6d} "
                     f"{ms / steps:8.3f} {100 * ms / total:6.2f}")
    lines.append("")
    by_cat = defaultdict(float)
    for name, ms in by_name.items():
        by_cat[cats.get(name, ("other", ""))[0]] += ms
    lines.append(f"{'hlo category':35s} {'ms/step':>9s} {'%':>6s}")
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
