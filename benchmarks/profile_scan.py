"""Honest stage timing on the axon platform.

The axon runtime defers execution: `block_until_ready` can return before
the device work has run, so Python-side timing loops (even chained ones)
under-measure. The only trustworthy method found (see PROGRESS notes):
run K iterations of the op inside ONE jitted `lax.scan`, force a scalar
to host with np.asarray, and difference two K values to cancel dispatch +
transfer overhead.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_scan.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae_teb_tpu.models import SeqVaeTeb
from vae_teb_tpu.ops import PhaseScattering1D
from vae_teb_tpu.ops import fft as sfft


def scan_time(make_step, init_carry, k_lo=2, k_hi=12, reps=3):
    """Per-iteration device ms of `step`, overhead-cancelled.

    make_step(carry, i) -> carry must keep a data dependency chain so
    iterations can't be elided.
    """
    times = {}
    for k in (k_lo, k_hi):
        @jax.jit
        def run(c0):
            c, _ = jax.lax.scan(make_step, c0, jnp.arange(k))
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b) * 0.0, c, 0.0) + _scalar_probe(c)
        run(init_carry)  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(init_carry))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo) * 1000


def _scalar_probe(c):
    leaves = jax.tree_util.tree_leaves(c)
    return jnp.sum(leaves[0]) * 1e-12


def main():
    B, N, trim = 32, 5760, 30
    sc = PhaseScattering1D(J=11, Q=4, T=16, shape=N, max_order=1)
    sel = sc.optimal_fhr_selection()
    phase_idx = tuple(int(i) for i in sel["phase_selection"]["selected_indices"])
    cross_idx = tuple(int(i) for i in sel["cross_selection"]["selected_indices"])
    S = sc.scattering.n_out - 2 * trim

    rng_np = np.random.default_rng(0)
    fhr = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))
    up = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))
    raw = jnp.asarray(rng_np.standard_normal((B, 4800)).astype(np.float32))

    def dep(x, out):
        """Fold a scalar of `out` back into x to chain iterations."""
        s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
        return x + s * 1e-20

    # --- front-end stages ---------------------------------------------------
    def scat_step(c, i):
        out = sc.scattering(c)
        return dep(c, out), None
    t = scan_time(scat_step, fhr)
    print(f"scattering only:        {t:8.2f} ms", flush=True)

    def phase_step(c, i):
        out = sc._forward(c, True, False, phase_subset=phase_idx,
                          compute_scattering=False)
        return dep(c, out), None
    t = scan_time(phase_step, fhr)
    print(f"phase(44) only:         {t:8.2f} ms", flush=True)

    x2 = jnp.stack([fhr, up], axis=1)

    def cross_step(c, i):
        out = sc._forward(c, False, True, cross_subset=cross_idx,
                          compute_scattering=False)
        return dep(c, out), None
    t = scan_time(cross_step, x2)
    print(f"cross(130) only:        {t:8.2f} ms", flush=True)

    def fe_step(c, i):
        f, u = c
        out = sc._analyze(f, u, phase_subset=phase_idx,
                          cross_subset=cross_idx)
        return (dep(f, out), dep(u, out)), None
    t_fe = scan_time(fe_step, (fhr, up))
    print(f"front end (fused analyze): {t_fe:8.2f} ms", flush=True)

    # --- VAE train step -----------------------------------------------------
    model = SeqVaeTeb()
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "sample": rng},
                           jnp.zeros((1, S, 43)), jnp.zeros((1, S, 44)),
                           jnp.zeros((1, S, 130)), train=False)
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adamw(1e-4, weight_decay=1e-4))
    y_st = jnp.asarray(rng_np.standard_normal((B, S, 43)).astype(np.float32))
    y_ph = jnp.asarray(rng_np.standard_normal((B, S, 44)).astype(np.float32))
    x_ph = jnp.asarray(rng_np.standard_normal((B, S, 130)).astype(np.float32))

    def vae_step(c, i):
        params, batch_stats, opt_state = c
        key = jax.random.fold_in(jax.random.PRNGKey(1), i)

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
        return (params, upd["batch_stats"], opt_state), None

    carry0 = (variables["params"], variables["batch_stats"],
              tx.init(variables["params"]))
    t_vae = scan_time(vae_step, carry0)
    print(f"VAE train step:         {t_vae:8.2f} ms", flush=True)

    print(f"\nfull pipeline estimate: {t_fe + t_vae:8.2f} ms "
          f"-> {B / (t_fe + t_vae) * 1000:.0f} windows/s", flush=True)


if __name__ == "__main__":
    main()
