"""Serving-path benchmark: exported-artifact throughput + streaming latency.

Measures the deployment story (serve.py) the way a serving fleet would
run it:

  1. full-forward inference through a deserialized StableHLO artifact
     (batch sweep, steady-state windows/s + per-batch latency),
  2. StreamingSession per-chunk causal encode latency (the interactive
     path: one decimated timestep in, one latent out, state carried on
     device).

Run on the real chip (default platform) or CPU. Steady-state protocol
from bench.py: queue K iterations, block once (one-shot calls through
the axon tunnel pay ~20 ms of dispatch bubbles, CLAUDE.md).

Usage: python benchmarks/serve_bench.py [--batches 1,8,32] [--seq 300]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--seq", type=int, default=300,
                    help="decimated sequence length (production 300)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--stream-steps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vae_teb_tpu import serve
    from vae_teb_tpu.models import SeqVaeTeb

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})")
    S = args.seq
    model = SeqVaeTeb()
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)

    def batch(b):
        return {k: r.standard_normal((b, S, c)).astype(np.float32)
                for k, c in (("fhr_st", 43), ("fhr_ph", 44),
                             ("fhr_up_ph", 130))}

    ex = batch(2)
    variables = model.init(
        {"params": rng, "sample": rng}, jnp.asarray(ex["fhr_st"]),
        jnp.asarray(ex["fhr_ph"]), jnp.asarray(ex["fhr_up_ph"]),
        train=False)

    # one symbolic-batch artifact serves every batch size
    t0 = time.perf_counter()
    exported = serve.export_inference(model, variables, ex)
    blob = exported.serialize()
    art = jax.export.deserialize(bytearray(blob))
    print(f"artifact: {len(blob) / 1e6:.1f} MB, exported+roundtripped in "
          f"{time.perf_counter() - t0:.1f}s")

    call = jax.jit(lambda v, a, b_, c: art.call(v, a, b_, c))
    for b in (int(x) for x in args.batches.split(",")):
        nb = batch(b)
        a1, a2, a3 = (jnp.asarray(nb[k]) for k in
                      ("fhr_st", "fhr_ph", "fhr_up_ph"))
        out = call(variables, a1, a2, a3)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [call(variables, a1, a2, a3) for _ in range(args.iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"inference b={b:3d}: {b / dt:9.1f} windows/s steady, "
              f"{dt * 1e3:7.2f} ms/batch")

    # streaming: one decimated timestep per call, state on device
    sess = serve.StreamingSession(model, variables, batch_size=1)
    x = jnp.asarray(r.standard_normal((1, args.stream_steps, 130))
                    .astype(np.float32))
    mu = sess.step(x[:, :1])  # compile
    jax.block_until_ready(mu)
    t0 = time.perf_counter()
    for t in range(1, args.stream_steps):
        mu = sess.step(x[:, t:t + 1])
    jax.block_until_ready(mu)
    dt = (time.perf_counter() - t0) / (args.stream_steps - 1)
    print(f"streaming encode: {dt * 1e3:.3f} ms/timestep "
          f"(chunk=1, batch=1, state carried on device)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
