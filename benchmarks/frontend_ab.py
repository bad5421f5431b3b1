"""A/B the frontend correlation precision on the real chip.

Measures sc._analyze (scattering + 44 phase + 130 cross, production
J=11,Q=4,T=16 shapes) per-step time at the production batch, scan-
differenced with bench.py's exact methodology: AOT-compiled K-step scan,
inputs closed over and perturbed per step by the scan index at fp32 scale
(so XLA can neither hoist the body nor skip steps), one scalar forced to
host, two K values differenced.

correlation_dtype in {None (exact fp32/HIGHEST), bfloat16 (bf16 products
+ single-pass MXU decimate matmul, fp32 accumulation)}.

Usage: python benchmarks/frontend_ab.py [--batch N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vae_teb_tpu.ops import PhaseScattering1D


def main():
    B, N = 128, 5760
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    rng_np = np.random.default_rng(0)
    fhr = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))
    up = jnp.asarray(rng_np.standard_normal((B, N)).astype(np.float32))

    configs = [("fp32/HIGHEST", None, False), ("bf16-corr", jnp.bfloat16, False)]
    if "--reduced" in sys.argv:
        configs = [("bf16-corr", jnp.bfloat16, False),
                   ("reduced", None, True),
                   ("reduced+bf16", jnp.bfloat16, True)]
    for label, cdt, rr in configs:
        sc = PhaseScattering1D(J=11, Q=4, T=16, shape=N, max_order=1,
                               correlation_dtype=cdt, reduced_rate=rr)
        sel = sc.optimal_fhr_selection()
        p_idx = tuple(int(i) for i in
                      sel["phase_selection"]["selected_indices"])
        c_idx = tuple(int(i) for i in
                      sel["cross_selection"]["selected_indices"])

        def run_k(k):
            @jax.jit
            def run(acc0):
                def body(acc, i):
                    fi = fhr + (jnp.float32(i) + acc * 1e-20) * 1e-6
                    out = sc._analyze(fi, up, phase_subset=p_idx,
                                      cross_subset=c_idx)
                    s = sum(jnp.sum(o.astype(jnp.float32))
                            for o in jax.tree_util.tree_leaves(out))
                    return acc + s, None
                acc, _ = jax.lax.scan(body, acc0, jnp.arange(k))
                return acc
            compiled = run.lower(jnp.float32(0.0)).compile()
            float(np.asarray(compiled(jnp.float32(0.0))))  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(compiled(jnp.float32(0.0))))
                best = min(best, time.perf_counter() - t0)
            return best

        k_lo, k_hi = 2, 12
        t_lo, t_hi = run_k(k_lo), run_k(k_hi)
        dt = (t_hi - t_lo) / (k_hi - k_lo) * 1000
        print(f"frontend batch={B} {label:14s} {dt:8.2f} ms/step"
              f"  (t{k_lo}={t_lo*1000:.1f} ms, t{k_hi}={t_hi*1000:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
