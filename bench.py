"""Headline benchmark: scattering+VAE fwd-bwd throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/sec/chip", "vs_baseline": N}

The pipeline benchmarked per window (matching BASELINE.json's metric):
  raw (FHR, UP) -> on-device phase scattering (43 scattering + 44 phase +
  130 selected cross coefficients, one fused transform) -> trim ->
  SeqVaeTeb forward + ELBO -> backward + AdamW update.

Timing methodology (round 2): the axon runtime defers execution, so
`block_until_ready` around a Python loop under-measures (it can return
before the device work ran). All timing here runs K steps inside ONE
jitted lax.scan, forces a scalar to host, and differences two K values to
cancel dispatch/compile/transfer overhead. This is also the production
loop shape (steps chained on device, no host round trips).

Baseline: the torch reference executing the identical pipeline on the host
CPU (kymatio_phase_scattering forward + SeqVaeTeb fwd/bwd), measured with
benchmarks/reference_cpu.py and recorded in BASELINE.md.
"""

import json
import time
from functools import partial

import numpy as np


def _load_baseline():
    import re
    try:
        with open(__file__.replace("bench.py", "BASELINE.md")) as f:
            text = f.read()
        m = re.search(r"REF_CPU_PIPELINE_WINDOWS_PER_SEC\s*=\s*([0-9.]+)", text)
        if m:
            return float(m.group(1))
    except OSError:
        pass
    return None


# TPU v5e (v5 lite) peak dense bf16 matmul throughput per chip. Source:
# Google Cloud TPU v5e spec sheet (197 TFLOP/s bf16). fp32 runs at the
# same MXU rate via bf16x3 passes or on the VPU; bf16 peak is the honest
# denominator for the production (bf16) configuration.
V5E_PEAK_FLOPS = 197e12

# TPU v5e HBM bandwidth per chip (Google Cloud spec sheet: 819 GB/s).
# The model is bandwidth/latency-bound, not FLOPs-bound (BASELINE.md trace
# tables), so achieved-HBM-utilization is the honest companion to MFU.
V5E_HBM_BYTES_PER_S = 819e9


def main():
    import os
    import sys

    import jax
    import jax.numpy as jnp
    import optax
    from vae_teb_tpu.models import SeqVaeTeb
    from vae_teb_tpu.ops import PhaseScattering1D

    # precision policy for the VAE step (the FFT frontend stays fp32: the
    # measured parity tradeoff in BASELINE.md). Default bf16 = the
    # production training configuration (reference trains 16-mixed).
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    if "--fp32" in sys.argv:
        precision = "fp32"
    model_dtype = jnp.bfloat16 if precision == "bf16" else None

    # batch 128 = the measured throughput-optimal production batch on v5e
    # (BASELINE.md round-3 sweep: 1823/1953/2528 win/s at 32/64/128 — the
    # LSTM recurrence latency and optimizer HBM sweeps are per-step, not
    # per-window). --batch 32 is the latency-balanced config (17.6 ms step).
    B, N = 128, 5760
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    trim = 30
    # bf16 correlation stage (products + decimate matmul; polar math and
    # scattering stay fp32): measured 1.1e-3 rel coefficient error — 4x
    # below the bf16 encoder's own input quantization — for a single-pass
    # MXU decimate matmul and half the pair-rate HBM traffic.
    # --fp32-frontend A/Bs the exact fp32/HIGHEST frontend back in.
    corr_dtype = (jnp.bfloat16 if precision == "bf16"
                  and "--fp32-frontend" not in sys.argv else None)
    # Reduced-rate pipeline (ops.phase_reduced) — every selected pair's
    # band synthesis / polar / product runs at its lowest alias-safe rate.
    # PRODUCTION DEFAULT since round 5, with the full evidence chain in
    # BASELINE.md: on-chip A/B (frontend 19.48 -> 13.88 ms/step at batch
    # 128), float64-oracle error INSIDE the fp32 implementation spread
    # (2.2e-2 vs the torch reference's own 3.3e-2,
    # test_reduced_rate_oracle_acceptance), AND the 300-step full-config
    # training-parity + behavioral-probe run over a dataset built with
    # this frontend (BASELINE.md round-5). --exact-frontend A/Bs the
    # full-rate pipeline back in.
    reduced = "--exact-frontend" not in sys.argv
    sc = PhaseScattering1D(J=11, Q=4, T=16, shape=N, max_order=1,
                           correlation_dtype=corr_dtype,
                           reduced_rate=reduced)
    sel = sc.optimal_fhr_selection()
    phase_idx = tuple(int(i) for i in sel["phase_selection"]["selected_indices"])
    cross_idx = tuple(int(i) for i in sel["cross_selection"]["selected_indices"])
    S = sc.scattering.n_out - 2 * trim

    # --schedule {stacked,wavefront,wavefront_pallas} A/Bs the LSTM
    # execution schedule (BASELINE.md round-3 table). Production default =
    # the pallas wavefront kernels: measured 2834 win/s at batch 128 vs
    # 2528 for the XLA wavefront (the recurrence itself is 4.2x faster —
    # W_eff stays VMEM-resident across the sequential grid). Single-chip
    # only: multi-chip meshes keep schedule="wavefront" (a pallas call is
    # opaque to GSPMD partitioning).
    schedule = "wavefront_pallas"
    if "--schedule" in sys.argv:
        schedule = sys.argv[sys.argv.index("--schedule") + 1]
    model = SeqVaeTeb(dtype=model_dtype, lstm_schedule=schedule)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "sample": rng},
        jnp.zeros((1, S, 43)), jnp.zeros((1, S, 44)), jnp.zeros((1, S, 130)),
        train=False)
    # bf16 at-rest Adam moments halve the optimizer's HBM sweep over the
    # 92M-param decoder heads (trace_table.txt: 3.4 ms/step at fp32)
    from vae_teb_tpu.train.schedules import make_optimizer
    moment_dtype = None if "--fp32-moments" in sys.argv else jnp.bfloat16
    # flat_param_fusion (one packed sweep for the ~300 small tensors) is
    # the production default; --no-fuse-params A/Bs it away
    tx = make_optimizer(1e-4, 0.5, 1e-4, moment_dtype=moment_dtype,
                        fuse_small_params="--no-fuse-params" not in sys.argv)

    def frontend(fhr, up):
        out = sc._analyze(fhr, up, phase_subset=phase_idx,
                          cross_subset=cross_idx)
        sl = slice(trim, sc.scattering.n_out - trim)
        y_st = jnp.swapaxes(out["scattering"][:, :, sl], 1, 2)
        y_ph = jnp.swapaxes(out["phase_corr"][:, :, sl], 1, 2)
        x_ph = jnp.swapaxes(out["cross_phase_corr"][:, :, sl], 1, 2)
        return y_st, y_ph, x_ph

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

    flops_per_step = [None]
    bytes_per_step = [None]

    def run_k(k, want_flops=False):
        @jax.jit
        def run(c0):
            c, losses = jax.lax.scan(
                partial(pipeline_step, fhr=fhr, up=up, raw=raw),
                c0, jnp.arange(k))
            return losses[-1]
        compiled = run.lower(carry0).compile()  # AOT: compile exactly once
        if want_flops:
            # XLA's own cost model for the whole k-step program: the honest
            # numerator for MFU (counts the FLOPs the compiled program
            # executes, incl. backward + optimizer, not a hand model) and
            # for HBM utilization ("bytes accessed" covers every operand
            # read + result write XLA schedules against HBM).
            try:
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                if ca and "flops" in ca:
                    flops_per_step[0] = float(ca["flops"]) / k
                if ca and "bytes accessed" in ca:
                    bytes_per_step[0] = float(ca["bytes accessed"]) / k
            except Exception:
                pass
        float(np.asarray(compiled(carry0)))  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(compiled(carry0)))
            best = min(best, time.perf_counter() - t0)
        return best

    k_lo, k_hi = 2, 12
    dt = (run_k(k_hi, want_flops=True) - run_k(k_lo)) / (k_hi - k_lo)
    windows_per_sec = B / dt
    mfu = (flops_per_step[0] / dt / V5E_PEAK_FLOPS
           if flops_per_step[0] else None)
    hbm_util = (bytes_per_step[0] / dt / V5E_HBM_BYTES_PER_S
                if bytes_per_step[0] else None)

    # p50 encode latency: one window raw -> posterior latent (scattering +
    # all three encoders), the serving-side metric in BASELINE.json.
    # Includes fetching one latent scalar to the host (the deferred runtime
    # only guarantees completion at fetch time).
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    @jax.jit
    def encode_one(fhr1, up1):
        y_st, y_ph, x_ph = frontend(fhr1, up1)
        enc = model.apply({"params": params, "batch_stats": batch_stats},
                          y_st, y_ph, x_ph, train=False,
                          method=model.encode)
        return enc["mu_post"][0, -1, 0]

    f1, u1 = fhr[:1], up[:1]
    float(np.asarray(encode_one(f1, u1)))
    lat = []
    for i in range(20):
        fi = f1 + i * 1e-6  # new input each call: no cached replay
        t0 = time.perf_counter()
        float(np.asarray(encode_one(fi, u1)))
        lat.append((time.perf_counter() - t0) * 1000)
    p50 = float(np.percentile(lat, 50))

    # Steady-state per-window encode latency: K encodes chained inside one
    # jitted lax.scan, two K values differenced — the same methodology as
    # the throughput number. This isolates DEVICE time per window; the
    # one-shot p50 above additionally pays ~20 ms of per-call dispatch
    # through the axon tunnel (BASELINE.md), i.e. it measures transport,
    # not the chip. Each iteration perturbs the input at fp32 scale from
    # the scan index and folds the result into the carry so XLA can
    # neither hoist the body nor skip the chain.
    def encode_k(k):
        @jax.jit
        def run(acc0):
            def body(acc, i):
                fi = f1 + (jnp.float32(i) + acc * 1e-20) * 1e-6
                y_st, y_ph, x_ph = frontend(fi, u1)
                enc = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    y_st, y_ph, x_ph, train=False, method=model.encode)
                v = enc["mu_post"][0, -1, 0].astype(jnp.float32)
                return acc + v, v
            acc, _ = jax.lax.scan(body, acc0, jnp.arange(k))
            return acc
        run(jnp.float32(0.0))  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(run(jnp.float32(0.0))))
            best = min(best, time.perf_counter() - t0)
        return best

    # Wide K spread + best-of-5: the differenced batch-1 encode is ~1 ms
    # of device work against ~20 ms of tunnel dispatch, and a 10-step
    # spread measured noisy (0.5-3.3 ms across sessions, one negative —
    # BASELINE.md). 38 steps of spread puts the signal well above the
    # per-call jitter.
    sk_lo, sk_hi = 2, 40
    steady_latency_ms = 1000.0 * (encode_k(sk_hi) - encode_k(sk_lo)) / (
        sk_hi - sk_lo)

    baseline = _load_baseline()
    vs = windows_per_sec / baseline if baseline else None
    print(json.dumps({
        "metric": "scattering+VAE fwd-bwd throughput",
        "value": round(windows_per_sec, 3),
        "unit": "windows/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "p50_encode_latency_ms": round(p50, 2),
        "steady_latency_ms": round(float(steady_latency_ms), 3),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "hbm_util": round(hbm_util, 4) if hbm_util is not None else None,
        "batch_size": B,
        "precision": precision,
        "frontend": (("reduced+" if reduced else "")
                     + ("bf16-corr" if corr_dtype is not None else "fp32")),
        "lstm_schedule": schedule,
    }))


if __name__ == "__main__":
    main()
