"""Stacked vs wavefront LSTM schedule on the real chip.

Times the exact production configuration of the fused encoder scan —
two streams x 4 layers, H=64, B=32, S=300, bf16 — under both schedules,
forward-only and forward+backward, with the scan-differencing methodology
(see profile_scan.py docstring; pitfalls in CLAUDE.md: fp32-scale index
dependence, every grad leaf consumed, K-differenced timing).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_wavefront.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vae_teb_tpu.models.blocks import LSTMStream, run_lstm_streams

B, S, H, L = 32, 300, 64, 4
DT = jnp.bfloat16


def make_weights(seed):
    r = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32) * 0.2)
    return dict(
        w_ih=[f32(H, 4 * H) for _ in range(L)],
        w_hh=[f32(H, 4 * H) for _ in range(L)],
        b=[f32(4 * H) * 0.1 for _ in range(L)])


W1, W2 = make_weights(1), make_weights(2)
r = np.random.default_rng(0)
XP1 = jnp.asarray(r.standard_normal((B, S, 4 * H)).astype(np.float32))
XP2 = jnp.asarray(r.standard_normal((B, S, 4 * H)).astype(np.float32))


def cast(w):
    return jax.tree.map(lambda a: a.astype(DT), w)


def build(xp1, xp2, w1=None, w2=None):
    zeros = tuple(jnp.zeros((B, H), DT) for _ in range(L))
    c1, c2 = cast(w1 or W1), cast(w2 or W2)
    st1 = LSTMStream(xp1.astype(DT), c1["w_ih"], c1["w_hh"], c1["b"],
                     (zeros, zeros))
    st2 = LSTMStream(xp2.astype(DT), c2["w_ih"], c2["w_hh"], c2["b"],
                     (zeros, zeros))
    return [st1, st2]


def scan_time(step, k_lo=2, k_hi=12, reps=3):
    times = {}
    for k in (k_lo, k_hi):
        @jax.jit
        def run(x1, x2):
            (o1, o2), _ = jax.lax.scan(step, (x1, x2), jnp.arange(k))
            return jnp.sum(o1.astype(jnp.float32)) * 1e-9 + jnp.sum(
                o2.astype(jnp.float32)) * 1e-9
        float(np.asarray(run(XP1, XP2)))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(XP1, XP2)))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo) * 1000


def fwd_step(schedule, unroll):
    def step(carry, i):
        x1, x2 = carry
        x1 = x1 + jnp.float32(i) * 1e-6
        (y1, (h1, c1)), (y2, (h2, c2)) = run_lstm_streams(
            build(x1, x2), unroll=unroll, schedule=schedule)
        s = (jnp.sum(y1.astype(jnp.float32)) + jnp.sum(y2.astype(jnp.float32))
             + jnp.sum(h1.astype(jnp.float32)) + jnp.sum(c2.astype(jnp.float32)))
        return (x1 + s * 1e-20, x2 + s * 1e-20), None
    return step


def fwdbwd_step(schedule, unroll):
    # grads wrt xs AND every weight leaf: the out-of-scan weight-gradient
    # matmuls are part of what differs between schedules — leaving any
    # leaf unconsumed would let DCE delete them (CLAUDE.md pitfall).
    def loss_fn(x1, x2, w1, w2):
        (y1, (h1, c1)), (y2, (h2, c2)) = run_lstm_streams(
            build(x1, x2, w1, w2), unroll=unroll, schedule=schedule)
        return (jnp.sum(y1.astype(jnp.float32) ** 2)
                + jnp.sum(y2.astype(jnp.float32) ** 2)
                + jnp.sum(h1.astype(jnp.float32)) + jnp.sum(c2.astype(jnp.float32)))

    def step(carry, i):
        x1, x2 = carry
        x1 = x1 + jnp.float32(i) * 1e-6
        v, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
            x1, x2, W1, W2)
        s = v + sum(jnp.sum(g.astype(jnp.float32))
                    for g in jax.tree.leaves(grads))
        return (x1 + s * 1e-20, x2 + s * 1e-20), None
    return step


def main():
    unrolls = [int(u) for u in sys.argv[1:]] or [16]
    for unroll in unrolls:
        for schedule in ("stacked", "wavefront", "wavefront_pallas"):
            tf = scan_time(fwd_step(schedule, unroll))
            tb = scan_time(fwdbwd_step(schedule, unroll))
            print(f"unroll {unroll:3d} {schedule:9s}: fwd {tf:6.2f} ms   "
                  f"fwd+bwd {tb:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
