"""Beta (KLD weight) and learning-rate schedules.

Matches the reference's training dynamics:
  - beta: constant / linear / cyclic per-epoch annealing
    (/root/reference/model/pytorch_lightning_modules.py:442-461)
  - LR: AdamW + CosineAnnealingWarmRestarts stepped per optimizer step with
    T_0 = max_milestone // 4, T_mult = 1, eta_min = 0.01 * lr
    (pytorch_lightning_modules.py:537-564)
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def beta_schedule(schedule: str = "linear", beta_start: float = 0.0,
                  beta_end: float = 1.0, anneal_epochs: int = 100,
                  cycle_len: int = 1000, const_val: float = 1.0
                  ) -> Callable[[int], float]:
    """Per-epoch KLD weight."""
    def fn(epoch: int) -> float:
        if schedule == "linear":
            progress = min(1.0, epoch / anneal_epochs)
            return beta_start + (beta_end - beta_start) * progress
        if schedule == "cyclic":
            progress = (epoch % cycle_len) / cycle_len
            return beta_start + (beta_end - beta_start) * progress
        if schedule == "constant":
            return const_val
        raise ValueError(f"unknown beta schedule: {schedule}")
    return fn


def cosine_warm_restarts(base_lr: float, t0_steps: int,
                         eta_min_ratio: float = 0.01,
                         n_cycles: int = 64) -> optax.Schedule:
    """Cosine annealing with warm restarts (T_mult=1): identical cosine
    cycles of t0_steps, floored at eta_min_ratio * base_lr."""
    t0_steps = max(int(t0_steps), 1)

    def fn(step):
        import jax.numpy as jnp
        pos = (step % t0_steps) / t0_steps
        cos = 0.5 * (1.0 + jnp.cos(math.pi * pos))
        return base_lr * (eta_min_ratio + (1.0 - eta_min_ratio) * cos)
    return fn


def scale_by_adam_with_dtype(b1: float = 0.9, b2: float = 0.999,
                             eps: float = 1e-8, moment_dtype=None
                             ) -> optax.GradientTransformation:
    """scale_by_adam with BOTH moments stored in `moment_dtype`.

    TPU rationale: the AdamW update of this model's four 4800x4800 head
    kernels is a pure HBM-bandwidth sweep — 599 MB/step/tensor measured
    (fp32 param + mu + nu read/write, benchmarks/trace_table.txt). Storing
    mu AND nu in bf16 removes 184 MB of that per tensor (~30%). optax's
    adamw only exposes mu_dtype, so this reimplements the (bias-corrected)
    Adam moment update with casts; the math is optax's exactly, the
    accumulator arithmetic runs in the grad dtype and is rounded to
    moment_dtype at rest."""
    import jax
    import jax.numpy as jnp

    def cast(t):
        return (jax.tree.map(lambda x: x.astype(moment_dtype), t)
                if moment_dtype is not None else t)

    def init_fn(params):
        zeros = jax.tree.map(
            lambda p: jnp.zeros_like(
                p, dtype=moment_dtype or p.dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.copy, zeros),
            nu=zeros)

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda g, m: b1 * m.astype(g.dtype) + (1 - b1) * g,
                          updates, state.mu)
        nu = jax.tree.map(
            lambda g, v: b2 * v.astype(g.dtype) + (1 - b2) * (g * g),
            updates, state.nu)
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=cast(mu),
                                           nu=cast(nu))

    return optax.GradientTransformation(init_fn, update_fn)


def flat_param_fusion(inner: optax.GradientTransformation,
                      threshold: int = 1 << 20
                      ) -> optax.GradientTransformation:
    """Run `inner` over a packed tree: every leaf with fewer than
    `threshold` elements is raveled into ONE flat fp32 vector; leaves at or
    above it stay individual.

    TPU rationale: this model has ~300 small parameter tensors (the deep
    narrow conv/MLP/LSTM stack) next to four 4800x4800 decoder heads. XLA
    compiles the optimizer leaf-by-leaf, so AdamW + global-norm clipping
    emit hundreds of sub-0.1 ms fusions and per-leaf reductions — pure
    per-op launch latency, part of the measured ~18 ms small-op tail
    (benchmarks/trace_table.txt). Packing the small leaves makes the whole
    small-parameter optimizer ONE contiguous sweep and the clip norm a
    handful of reductions, while the big heads keep their own (bandwidth-
    dominated, already bf16-moment) updates.

    Exactness: Adam/weight-decay/LR are elementwise and the clip norm is a
    global sum of squares, so packing is semantics-preserving; small-leaf
    casts to fp32 are exact for bf16/fp32 inputs (the only dtypes in use).
    Update dtypes are restored per leaf on unpack. The partition is static
    given the tree structure (recomputed at trace time, zero runtime
    cost)."""
    import jax
    import jax.numpy as jnp

    def _split(tree):
        leaves, treedef = jax.tree.flatten(tree)
        big = tuple(i for i, l in enumerate(leaves) if l.size >= threshold)
        small = tuple(i for i, l in enumerate(leaves) if l.size < threshold)
        return leaves, treedef, big, small

    def _pack(tree):
        leaves, _, big, small = _split(tree)
        packed = {"big": tuple(leaves[i] for i in big)}
        if small:
            packed["flat"] = jnp.concatenate(
                [leaves[i].astype(jnp.float32).ravel() for i in small])
        return packed

    def _unpack(packed, like):
        leaves, treedef, big, small = _split(like)
        out = [None] * len(leaves)
        for j, i in enumerate(big):
            out[i] = packed["big"][j]
        off = 0
        for i in small:
            n = leaves[i].size
            out[i] = (packed["flat"][off:off + n]
                      .reshape(leaves[i].shape).astype(leaves[i].dtype))
            off += n
        return jax.tree.unflatten(treedef, out)

    def init_fn(params):
        return inner.init(_pack(params))

    def update_fn(updates, state, params=None):
        packed_p = _pack(params) if params is not None else None
        upd, state = inner.update(_pack(updates), state, packed_p)
        return _unpack(upd, like=updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(lr, grad_clip_norm: float = 0.5,
                   weight_decay: float = 1e-4,
                   b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8,
                   moment_dtype=None,
                   fuse_small_params: bool = True
                   ) -> optax.GradientTransformation:
    """AdamW chain with global-norm clipping (reference grad-clip 0.5 via
    Lightning, graph_model.py:511; weight decay 1e-4, lightning module
    :541-546). moment_dtype=jnp.bfloat16 stores the Adam moments at rest in
    bf16 (see scale_by_adam_with_dtype); None keeps optax's stock fp32
    path. fuse_small_params packs all sub-1M-element leaves into one flat
    vector for the whole chain (see flat_param_fusion)."""
    if moment_dtype is None:
        adam = optax.adamw(learning_rate=lr, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)
    else:
        adam = optax.chain(
            scale_by_adam_with_dtype(b1=b1, b2=b2, eps=eps,
                                     moment_dtype=moment_dtype),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(lr),
        )
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        adam,
    )
    return flat_param_fusion(tx) if fuse_small_params else tx
