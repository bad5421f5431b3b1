"""Headline benchmark: scattering+VAE fwd-bwd throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/sec/chip", "vs_baseline": N}

The pipeline benchmarked per window (matching BASELINE.json's metric):
  raw (FHR, UP) -> on-device phase scattering (43 scattering + 44 phase +
  130 selected cross coefficients) -> normalization-shaped trim ->
  SeqVaeTeb forward + ELBO -> backward + AdamW update.

Baseline: the torch reference executing the identical pipeline on the host
CPU (kymatio_phase_scattering forward + SeqVaeTeb fwd/bwd), measured with
benchmarks/reference_cpu.py and recorded in BASELINE.md.
"""

import json
import time
from functools import partial

import numpy as np

# Measured torch-CPU reference throughput on this host (see BASELINE.md and
# benchmarks/reference_cpu.py; single-core host, batch 2, J=11 Q=4 T=16).
REF_CPU_WINDOWS_PER_SEC = None  # filled from BASELINE.md at runtime


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


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from vae_teb_tpu.models import SeqVaeTeb
    from vae_teb_tpu.ops import PhaseScattering1D

    B, N = 32, 5760
    trim = 30
    sc = PhaseScattering1D(J=11, Q=4, T=16, shape=N, max_order=1)
    sel = sc.optimal_fhr_selection()
    phase_idx = tuple(int(i) for i in sel["phase_selection"]["selected_indices"])
    cross_idx = tuple(int(i) for i in sel["cross_selection"]["selected_indices"])
    S = sc.scattering.n_out - 2 * trim

    model = SeqVaeTeb()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "sample": rng},
        jnp.zeros((1, S, 43)), jnp.zeros((1, S, 44)), jnp.zeros((1, S, 130)),
        train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adamw(1e-4, weight_decay=1e-4))
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def pipeline_step(params, batch_stats, opt_state, fhr, up, raw, key):
        out_ph = sc._forward(fhr, True, False, phase_subset=phase_idx)
        x2 = jnp.stack([fhr, up], axis=1)
        out_cr = sc._forward(x2, False, True, cross_subset=cross_idx,
                             compute_scattering=False)
        sl = slice(trim, sc.scattering.n_out - trim)
        y_st = jnp.swapaxes(out_ph["scattering"][:, :, sl], 1, 2)
        y_ph = jnp.swapaxes(out_ph["phase_corr"][:, :, sl], 1, 2)
        x_ph = jnp.swapaxes(out_cr["cross_phase_corr"][:, :, sl], 1, 2)

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
        return params, upd["batch_stats"], opt_state, loss

    rng_np = np.random.default_rng(0)
    fhr = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))
    up = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))
    raw = jnp.asarray(rng_np.standard_normal((B, 4800)).astype(np.float32))

    # warmup / compile
    key = jax.random.PRNGKey(1)
    params, batch_stats, opt_state, loss = pipeline_step(
        params, batch_stats, opt_state, fhr, up, raw, key)
    loss.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        params, batch_stats, opt_state, loss = pipeline_step(
            params, batch_stats, opt_state, fhr, up, raw, key)
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    windows_per_sec = B / dt

    # p50 encode latency: one window raw -> posterior latent (scattering +
    # all three encoders), the serving-side metric in BASELINE.json.
    @jax.jit
    def encode_one(fhr1, up1):
        out_ph = sc._forward(fhr1, True, False, phase_subset=phase_idx)
        x2 = jnp.stack([fhr1, up1], axis=1)
        out_cr = sc._forward(x2, False, True, cross_subset=cross_idx,
                             compute_scattering=False)
        sl = slice(trim, sc.scattering.n_out - trim)
        y_st = jnp.swapaxes(out_ph["scattering"][:, :, sl], 1, 2)
        y_ph = jnp.swapaxes(out_ph["phase_corr"][:, :, sl], 1, 2)
        x_ph = jnp.swapaxes(out_cr["cross_phase_corr"][:, :, sl], 1, 2)
        enc = model.apply({"params": params, "batch_stats": batch_stats},
                          y_st, y_ph, x_ph, train=False,
                          method=model.encode)
        return enc["mu_post"]

    f1, u1 = fhr[:1], up[:1]
    encode_one(f1, u1).block_until_ready()
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        encode_one(f1, u1).block_until_ready()
        lat.append((time.perf_counter() - t0) * 1000)
    p50 = float(np.percentile(lat, 50))

    baseline = _load_baseline()
    vs = windows_per_sec / baseline if baseline else None
    print(json.dumps({
        "metric": "scattering+VAE fwd-bwd throughput",
        "value": round(windows_per_sec, 3),
        "unit": "windows/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "p50_encode_latency_ms": round(p50, 2),
        "batch_size": B,
    }))


if __name__ == "__main__":
    main()
