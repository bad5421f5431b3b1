"""Pallas TPU kernels for the wavefront LSTM recurrence.

The XLA `lax.scan` wavefront (blocks._wavefront_scan) already runs one
block-bidiagonal matmul per step; what remains per step is while-loop
bookkeeping (condition, buffer rotation, per-iteration DMA scheduling).
These kernels run the whole K-step recurrence as ONE pallas program with
a sequential grid over time: the packed W_eff (U*H, 4*U*H) stays resident
in VMEM across every step, the (h, c) carry lives in VMEM scratch, and
the per-step gate inputs / outputs are streamed by the blockspec pipeline
(Mosaic double-buffers the k-indexed blocks automatically).

Semantics are IDENTICAL to blocks._wavefront_scan / the reverse body of
blocks._wavefront_core_bwd — the same validity masking, the same packed
layouts — so blocks._wavefront_core can dispatch on an `impl` switch and
share the pack/unpack/post-scan-dW code. Parity is pinned by
tests/test_models.py::test_lstm_wavefront_matches_stacked[wavefront_pallas]
(interpret mode on CPU; compiled on the axon TPU).

VMEM budget at the production shape (two 4-layer streams, H=64, B=32,
bf16): W_eff 2.0 MB + gate-input block 128 KB x2 + output blocks
~288 KB x2 + carry scratch 64 KB — ~3 MB of the 16 MB core budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Interpret on CPU (tests), compile on TPU. The pallas schedule is
    opt-in (run_lstm_streams schedule="wavefront_pallas"), so this never
    runs on a CPU mesh by accident — only tests reach interpret mode."""
    return jax.default_backend() == "cpu"


def _batch_mesh(x, batch: int):
    """(mesh, data-axis name) to shard_map the recurrence over, or
    (None, None) to run unwrapped (single device).

    A compiled pallas call is an opaque custom call to the GSPMD/Shardy
    partitioner, so on a >1-device mesh the whole recurrence must be
    wrapped in `shard_map` over the batch axis — the kernel is purely
    batch-parallel (the carry, gate inputs, and outputs all broadcast
    over B; only W_eff/bias are shared, and they are replicated). The
    mesh is read off the traced aval at trace time (`aval.sharding.mesh`
    carries the abstract mesh inside jit even in Auto sharding mode), so
    no mesh handle has to be threaded through the model."""
    sh = getattr(getattr(x, "aval", None), "sharding", None)
    mesh = getattr(sh, "mesh", None)
    if mesh is None or getattr(mesh, "empty", True) or mesh.size <= 1:
        return None, None
    names = mesh.axis_names
    if "data" in names:
        axis = "data"
    elif len(names) == 1:
        axis = names[0]
    else:
        raise ValueError(
            "wavefront_pallas on a multi-axis mesh without a 'data' axis: "
            f"cannot infer the batch-sharded axis from {names}")
    n = dict(mesh.shape)[axis]
    if n > 1 and batch % n:
        raise ValueError(
            f"wavefront_pallas: batch {batch} not divisible by mesh axis "
            f"'{axis}' ({n} devices)")
    return mesh, axis


def _lvec_cols(lvec: np.ndarray, H: int) -> jnp.ndarray:
    """(1, U*H) int32: each unit's layer index repeated over its h lanes."""
    return jnp.asarray(np.repeat(lvec, H)[None, :], jnp.int32)


def _fwd_kernel(lvec_ref, xs_ref, w_ref, b_ref, h0_ref, c0_ref,
                *out_refs, S: int, with_residuals: bool):
    if with_residuals:
        h_seq_ref, gates_ref, c_seq_ref, hfin_ref, cfin_ref, h_scr, c_scr \
            = out_refs
    else:
        h_seq_ref, hfin_ref, cfin_ref, h_scr, c_scr = out_refs
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h, c = h_scr[:], c_scr[:]
    gates = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
    gates = gates + xs_ref[0].astype(jnp.float32) + b_ref[0].astype(
        jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    c_new = f * c.astype(jnp.float32) + i * jnp.tanh(g)
    h_new = o * jnp.tanh(c_new)
    valid = (k >= lvec_ref[:]) & (k < S + lvec_ref[:])  # (1, UH)
    h_out = jnp.where(valid, h_new.astype(h.dtype), h)
    c_out = jnp.where(valid, c_new.astype(c.dtype), c)
    h_scr[:] = h_out
    c_scr[:] = c_out
    h_seq_ref[0] = h_out
    if with_residuals:
        gates_ref[0] = gates.astype(gates_ref.dtype)
        c_seq_ref[0] = c_out
    hfin_ref[:] = h_out
    cfin_ref[:] = c_out


def wavefront_scan_pallas(W_eff, b_packed, xs_wave, h0, c0, lvec,
                          S: int, with_residuals: bool):
    """Forward wavefront as one pallas program. Same contract as
    blocks._wavefront_scan: ((h_fin, c_fin), h_seq) or
    ((h_fin, c_fin), (gates_seq, h_seq, c_seq)). On a >1-device mesh the
    program runs per batch shard under shard_map (see _batch_mesh)."""
    from jax.sharding import PartitionSpec as P
    mesh, ax = _batch_mesh(xs_wave, xs_wave.shape[1])
    if mesh is not None:
        fn = functools.partial(_wavefront_scan_pallas_local, lvec=lvec, S=S,
                               with_residuals=with_residuals)
        seq_sp = P(None, ax, None)
        fin_sp = P(ax, None)
        out_specs = ((fin_sp, fin_sp),
                     (seq_sp, seq_sp, seq_sp) if with_residuals else seq_sp)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(None, None), P(None), seq_sp, fin_sp, fin_sp),
            out_specs=out_specs, check_vma=False,
        )(W_eff, b_packed, xs_wave, h0, c0)
    return _wavefront_scan_pallas_local(W_eff, b_packed, xs_wave, h0, c0,
                                        lvec=lvec, S=S,
                                        with_residuals=with_residuals)


def _wavefront_scan_pallas_local(W_eff, b_packed, xs_wave, h0, c0, *, lvec,
                                 S: int, with_residuals: bool):
    K, B, G = xs_wave.shape  # G = 4*U*H
    UH = G // 4
    dtype = xs_wave.dtype

    const = lambda k: (0, 0)
    seq3 = lambda k: (k, 0, 0)
    in_specs = [
        pl.BlockSpec((1, UH), const, memory_space=pltpu.VMEM),    # lvec
        pl.BlockSpec((1, B, G), seq3, memory_space=pltpu.VMEM),   # xs
        pl.BlockSpec((UH, G), const, memory_space=pltpu.VMEM),    # W_eff
        pl.BlockSpec((1, G), const, memory_space=pltpu.VMEM),     # bias
        pl.BlockSpec((B, UH), const, memory_space=pltpu.VMEM),    # h0
        pl.BlockSpec((B, UH), const, memory_space=pltpu.VMEM),    # c0
    ]
    out_shape = [jax.ShapeDtypeStruct((K, B, UH), dtype)]         # h_seq
    out_specs = [pl.BlockSpec((1, B, UH), seq3, memory_space=pltpu.VMEM)]
    if with_residuals:
        out_shape += [jax.ShapeDtypeStruct((K, B, G), dtype),     # gates
                      jax.ShapeDtypeStruct((K, B, UH), dtype)]    # c_seq
        out_specs += [
            pl.BlockSpec((1, B, G), seq3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, UH), seq3, memory_space=pltpu.VMEM)]
    out_shape += [jax.ShapeDtypeStruct((B, UH), dtype),           # h_fin
                  jax.ShapeDtypeStruct((B, UH), dtype)]           # c_fin
    out_specs += [pl.BlockSpec((B, UH), const, memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, UH), const, memory_space=pltpu.VMEM)]

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, with_residuals=with_residuals),
        grid=(K,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, UH), dtype),
                        pltpu.VMEM((B, UH), dtype)],
        interpret=_interpret(),
    )(_lvec_cols(lvec, UH // len(lvec)), xs_wave, W_eff,
      b_packed.reshape(1, G), h0, c0)
    if with_residuals:
        h_seq, gates_seq, c_seq, h_fin, c_fin = outs
        return (h_fin, c_fin), (gates_seq, h_seq, c_seq)
    h_seq, h_fin, c_fin = outs
    return (h_fin, c_fin), h_seq


def _bwd_kernel(lvec_ref, gates_ref, c_ref, cprev_ref, dy_ref, wt_ref,
                dh0_ref, dc0_ref, dgates_ref, dhfin_ref, dcfin_ref,
                dh_scr, dc_scr, *, S: int, K: int):
    j = pl.program_id(0)
    k = K - 1 - j  # reverse time

    @pl.when(j == 0)
    def _():
        dh_scr[:] = dh0_ref[:]
        dc_scr[:] = dc0_ref[:]

    dh_tot = dh_scr[:].astype(jnp.float32) + dy_ref[0].astype(jnp.float32)
    dc_c = dc_scr[:].astype(jnp.float32)
    gates = gates_ref[0].astype(jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    tc = jnp.tanh(c_ref[0].astype(jnp.float32))
    do = dh_tot * tc
    dct = dc_c + dh_tot * o * (1.0 - tc * tc)
    cprev = cprev_ref[0].astype(jnp.float32)
    dgates = jnp.concatenate(
        [dct * g * i * (1.0 - i),
         dct * cprev * f * (1.0 - f),
         dct * i * (1.0 - g * g),
         do * o * (1.0 - o)], axis=-1)
    valid = (k >= lvec_ref[:]) & (k < S + lvec_ref[:])   # (1, UH)
    m4 = jnp.concatenate([valid] * 4, axis=-1)           # (1, 4UH)
    dgates = jnp.where(m4, dgates, jnp.zeros_like(dgates))
    dgates = dgates.astype(dgates_ref.dtype)
    # one matmul: recurrent + feed cotangents (see blocks._wavefront_core_bwd)
    dz = jnp.dot(dgates, wt_ref[:],
                 preferred_element_type=jnp.float32)
    dh_new = dz + jnp.where(valid, 0.0, dh_tot)
    dc_new = jnp.where(valid, dct * f, dc_c)
    dh_scr[:] = dh_new.astype(dh_scr.dtype)
    dc_scr[:] = dc_new.astype(dc_scr.dtype)
    dgates_ref[0] = dgates
    dhfin_ref[:] = dh_new.astype(dhfin_ref.dtype)
    dcfin_ref[:] = dc_new.astype(dcfin_ref.dtype)


def wavefront_bwd_pallas(W_eff, gates_seq, c_seq, c_prev_seq, dY,
                         dh0, dc0, lvec, S: int):
    """Reverse wavefront as one pallas program. Returns
    ((dh_fin, dc_fin), dgates_seq) — the same values as the lax.scan
    reverse body in blocks._wavefront_core_bwd. Multi-device meshes run
    per batch shard under shard_map (see _batch_mesh); the weight grads
    are computed OUTSIDE this call from dgates_seq, so the cross-shard
    reduction stays in GSPMD-land as an ordinary sharded matmul."""
    from jax.sharding import PartitionSpec as P
    mesh, ax = _batch_mesh(gates_seq, gates_seq.shape[1])
    if mesh is not None:
        fn = functools.partial(_wavefront_bwd_pallas_local, lvec=lvec, S=S)
        seq_sp = P(None, ax, None)
        fin_sp = P(ax, None)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(None, None), seq_sp, seq_sp, seq_sp, seq_sp,
                      fin_sp, fin_sp),
            out_specs=((fin_sp, fin_sp), seq_sp), check_vma=False,
        )(W_eff, gates_seq, c_seq, c_prev_seq, dY, dh0, dc0)
    return _wavefront_bwd_pallas_local(W_eff, gates_seq, c_seq, c_prev_seq,
                                       dY, dh0, dc0, lvec=lvec, S=S)


def _wavefront_bwd_pallas_local(W_eff, gates_seq, c_seq, c_prev_seq, dY,
                                dh0, dc0, *, lvec, S: int):
    K, B, G = gates_seq.shape
    UH = G // 4
    dtype = gates_seq.dtype
    rev3 = lambda j: (K - 1 - j, 0, 0)
    const = lambda j: (0, 0)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S, K=K),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, UH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, G), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, UH), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, UH), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, UH), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, UH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, UH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, UH), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, G), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, UH), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, UH), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((K, B, G), dtype),
                   jax.ShapeDtypeStruct((B, UH), dtype),
                   jax.ShapeDtypeStruct((B, UH), dtype)],
        scratch_shapes=[pltpu.VMEM((B, UH), dtype),
                        pltpu.VMEM((B, UH), dtype)],
        interpret=_interpret(),
    )(_lvec_cols(lvec, UH // len(lvec)), gates_seq, c_seq, c_prev_seq,
      dY, jnp.swapaxes(W_eff, 0, 1), dh0, dc0)
    dgates_seq, dh_fin, dc_fin = outs
    return (dh_fin, dc_fin), dgates_seq
