"""Reusable model blocks: residual MLPs, causal/reflect conv blocks, LSTM.

Flax re-design of the reference's building blocks
(/root/reference/model/vae_teb_model.py:11-403). Layout is (B, S, C)
throughout — sequence-major channels-last, the native layout for both the
MXU (feature dim contiguous for matmuls) and flax convolutions — instead of
the reference's repeated (B,C,S)<->(B,S,C) transposes around every conv.

The LSTM is a per-layer `lax.scan` with the input projection hoisted out of
the scan as one large (B*S, C) x (C, 4H) matmul: inside the scan only the
(B, H) x (H, 4H) recurrent matmul remains. Gate order [i, f, g, o] matches
torch so the forget-gate bias-init convention carries over.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

xavier = nn.initializers.xavier_uniform
orthogonal = nn.initializers.orthogonal

# torch BatchNorm1d(momentum=0.9) updates running = 0.1*running + 0.9*batch;
# flax's momentum is the *keep* fraction, so the equivalent is 0.1
# (reference vae_teb_model.py:175,230).
BN_MOMENTUM = 0.1


def geometric_schedule(input_size: int, output_size: int, n_hidden: int,
                       round_fn=round) -> Tuple[int, ...]:
    """Geometric interpolation of layer widths from input to output size;
    returns n_hidden+1 sizes ending exactly at output_size
    (reference vae_teb_model.py:11-44)."""
    steps = n_hidden + 1
    r = (output_size / input_size) ** (1.0 / steps)
    sizes = []
    cur = r
    for _ in range(n_hidden):
        sizes.append(int(round_fn(input_size * cur)))
        cur *= r
    sizes.append(output_size)
    return tuple(sizes)


def linear_upsample(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Linear 2x upsampling along the sequence axis of (B, S, C);
    half-pixel-center convention (== torch interpolate align_corners=False)."""
    b, s, c = x.shape
    return jax.image.resize(x, (b, s * scale, c), method="linear")


class ResidualMLP(nn.Module):
    """LayerNorm(input) -> [Dense -> LN -> act]* -> optional skip-projection.

    Matches the reference block structure (vae_teb_model.py:336-403): the
    final layer drops act+LN when final_activation=False; the skip reads the
    *normalized* input and projects when widths differ.
    """
    hidden_dims: Sequence[int]
    final_activation: bool = True
    activation: Callable = nn.relu
    use_skip_connection: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x0 = nn.LayerNorm(dtype=self.dtype)(x)
        y = x0
        n = len(self.hidden_dims)
        for i, width in enumerate(self.hidden_dims):
            y = nn.Dense(width, kernel_init=xavier(), dtype=self.dtype)(y)
            is_final = i == n - 1
            if not is_final or self.final_activation:
                y = nn.LayerNorm(dtype=self.dtype)(y)
            if not is_final:
                y = self.activation(y)
        if self.final_activation:
            y = self.activation(y)
        if self.use_skip_connection:
            if x.shape[-1] != self.hidden_dims[-1]:
                skip = nn.Dense(self.hidden_dims[-1], kernel_init=xavier(),
                                dtype=self.dtype, name="skip_proj")(x0)
            else:
                skip = x0
            y = y + skip
        return y


class CausalConv1d(nn.Module):
    """Left-padded 1-D convolution over (B, S, C): no future leakage
    (reference vae_teb_model.py:77-125)."""
    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 carry: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """carry: optional (B, (k-1)*dilation, C) tail of the PRECEDING
        input chunk — streaming inference substitutes it for the zero left
        pad, making chunked application bit-equal to one full-sequence call
        (reference get_sequence_encoding's causal contract,
        vae_teb_model.py:723-740)."""
        pad = (self.kernel_size - 1) * self.dilation
        if carry is None:
            x = jnp.pad(x, [(0, 0), (pad, 0), (0, 0)])
        else:
            x = jnp.concatenate([carry.astype(x.dtype), x], axis=1)
        return nn.Conv(self.features, (self.kernel_size,),
                       kernel_dilation=(self.dilation,), padding="VALID",
                       use_bias=self.use_bias,
                       feature_group_count=self.feature_group_count,
                       kernel_init=xavier(), dtype=self.dtype)(x)


class CausalConvBlock(nn.Module):
    """Causal conv -> BatchNorm -> activation, optional 2x pre-upsample
    (reference CausalMultiChannelConvBlock, vae_teb_model.py:128-212)."""
    features: int
    kernel_size: int
    dilation: int = 1
    up_sampling: bool = False
    up_sample_scale: int = 2
    use_batch_norm: bool = True
    activation: Callable = nn.relu
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 carry: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.up_sampling:
            if carry is not None:
                raise ValueError("streaming carry is incompatible with "
                                 "up_sampling")
            x = linear_upsample(x, self.up_sample_scale)
        y = CausalConv1d(self.features, self.kernel_size, self.dilation,
                         use_bias=self.use_bias, dtype=self.dtype)(x, carry)
        if self.use_batch_norm:
            # Batch stats reduce over (batch, seq); under sharded jit the
            # batch-axis reduction is global => sync-BN across the mesh for
            # free (the reference needed Lightning sync_batchnorm).
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, dtype=self.dtype)(y)
        return self.activation(y)


class ReflectConvBlock(nn.Module):
    """Reflect-padded 'same' conv -> BN -> relu/tanh, optional 2x upsample
    (reference MultiChannelConvBlock, vae_teb_model.py:214-253)."""
    features: int
    kernel_size: int
    up_sampling: bool = False
    up_sample_scale: int = 2
    tanh: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.up_sampling:
            x = linear_upsample(x, self.up_sample_scale)
        p = (self.kernel_size - 1) // 2
        if p > 0:
            if x.shape[1] <= p:
                x = jnp.pad(x, [(0, 0), (p, p), (0, 0)], mode="edge")
            else:
                x = jnp.pad(x, [(0, 0), (p, p), (0, 0)], mode="reflect")
        y = nn.Conv(self.features, (self.kernel_size,), padding="VALID",
                    use_bias=False, kernel_init=xavier(), dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype)(y)
        return jnp.tanh(y) if self.tanh else nn.relu(y)


class LSTMStream:
    """A prepared multi-layer LSTM invocation: hoisted layer-0 input
    projection, precision-cast weights, and the initial (h, c) tuples —
    everything the scan body needs. Produced by LSTM.__call__(...,
    prepare=True); consumed by run_lstm_streams, which can fuse SEVERAL
    independent streams into ONE lax.scan."""

    def __init__(self, x_proj, w_ih, w_hh, biases, init):
        self.x_proj = x_proj          # (B, S, 4H)
        self.w_ih = w_ih              # per-layer input kernels (layer 0 consumed)
        self.w_hh = w_hh              # per-layer recurrent kernels
        self.biases = biases          # per-layer biases (layer 0 consumed)
        self.init = init              # (hs tuple, cs tuple)


def _lstm_gate_acts(gates):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    return nn.sigmoid(i), nn.sigmoid(f), jnp.tanh(g), nn.sigmoid(o)


def _lstm_cell(gates, h, c):
    i, f, g, o = _lstm_gate_acts(gates)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def _streams_scan(operands, unroll: int, with_residuals: bool):
    """The shared fused-streams forward scan. Per stream, per step, per
    layer: one (B,H)x(H,4H) gate matmul + cell elementwise. With
    with_residuals, additionally emits per-step (gates, h, c) per layer —
    exactly what the hand-written backward needs (the gate ACTIVATIONS are
    recomputed from the pre-activations in the backward; storing the
    pre-activation is 4H vs 4 activations' 4H, but lets XLA fuse the
    sigmoid/tanh re-evaluation into the backward elementwise block)."""

    def step(carries, xts):
        new_carries, outs = [], []
        for op, (hs, cs), xp0 in zip(operands, carries, xts):
            n_layers = len(op["w_hh"])
            new_h, new_c, gates_l = [], [], []
            inp = None
            for layer in range(n_layers):
                if layer == 0:
                    gates = xp0 + hs[0] @ op["w_hh"][0]
                else:
                    gates = (inp @ op["w_ih_rest"][layer - 1]
                             + op["b_rest"][layer - 1]
                             + hs[layer] @ op["w_hh"][layer])
                h, c = _lstm_cell(gates, hs[layer], cs[layer])
                new_h.append(h)
                new_c.append(c)
                gates_l.append(gates)
                inp = h
            new_carries.append((tuple(new_h), tuple(new_c)))
            outs.append((tuple(gates_l), tuple(new_h), tuple(new_c))
                        if with_residuals else inp)
        return tuple(new_carries), tuple(outs)

    init = tuple((op["init_h"], op["init_c"]) for op in operands)
    xs = tuple(op["xs"] for op in operands)
    return jax.lax.scan(step, init, xs, unroll=unroll)


def _grad_matmul(a, b):
    """einsum('sbh,sbg->hg') with fp32 accumulation, cast back to the
    primal dtype (bf16 primals would otherwise accumulate 9600 terms in
    8-bit mantissa; the autodiff baseline accumulates in the scan carry at
    the same dtype — fp32 here is strictly better)."""
    out = jnp.einsum("sbh,sbg->hg", a, b,
                     preferred_element_type=jnp.float32)
    return out.astype(a.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _streams_core(operands, unroll: int):
    """Fused multi-stream LSTM with a hand-written backward.

    Why not autodiff: JAX's scan-grad carries the weight-gradient
    accumulators ((H,4H) per layer per stream) THROUGH the 300-step reverse
    while-loop, adding two accumulation matmuls per layer to every
    sequential step (measured 5.1 ms vs 2.1 ms forward on v5e,
    benchmarks/trace_table.txt). Here the reverse scan computes only the
    per-step dgates (elementwise + two small matmuls), and every weight
    gradient becomes ONE large MXU matmul over the whole (S*B) axis after
    the scan: dW_hh[l] = h_prev[l]^T dgates[l], dW_ih[l] = h[l-1]^T
    dgates[l] — the classic out-of-recurrence gradient factorization, laid
    out for the MXU instead of the sequential path.
    """
    finals, ys = _streams_scan(operands, unroll, with_residuals=False)
    return tuple((y, h_f, c_f) for y, (h_f, c_f) in zip(ys, finals))


def _streams_core_fwd(operands, unroll: int):
    finals, seqs = _streams_scan(operands, unroll, with_residuals=True)
    out = tuple((seqs[k][1][-1],) + finals[k] for k in range(len(operands)))
    return out, (operands, seqs)


def _streams_core_bwd(unroll: int, res, cts):
    operands, seqs = res
    n = len(operands)

    xts, carries0 = [], []
    for k in range(n):
        op = operands[k]
        _, _, c_seq = seqs[k]
        n_layers = len(op["w_hh"])
        dys, dhf, dcf = cts[k]
        c_prev = tuple(
            jnp.concatenate([op["init_c"][layer][None], c_seq[layer][:-1]], 0)
            for layer in range(n_layers))
        xts.append((dys, seqs[k][0], c_prev, c_seq))
        carries0.append((tuple(dhf), tuple(dcf)))

    def body(carry, xt):
        new_carry, outs = [], []
        for k in range(n):
            op = operands[k]
            n_layers = len(op["w_hh"])
            dy, gates_t, cprev_t, c_t = xt[k]
            dh_c, dc_c = carry[k]
            new_dh, new_dc = [None] * n_layers, [None] * n_layers
            dgates_l = [None] * n_layers
            dinp = dy
            for layer in reversed(range(n_layers)):
                dh = dh_c[layer] + dinp
                i, f, g, o = _lstm_gate_acts(gates_t[layer])
                tc = jnp.tanh(c_t[layer])
                do = dh * tc
                dct = dc_c[layer] + dh * o * (1.0 - tc * tc)
                dgates = jnp.concatenate(
                    [dct * g * i * (1.0 - i),
                     dct * cprev_t[layer] * f * (1.0 - f),
                     dct * i * (1.0 - g * g),
                     do * o * (1.0 - o)], axis=-1)
                new_dh[layer] = dgates @ op["w_hh"][layer].T
                new_dc[layer] = dct * f
                dgates_l[layer] = dgates
                dinp = (dgates @ op["w_ih_rest"][layer - 1].T
                        if layer > 0 else None)
            new_carry.append((tuple(new_dh), tuple(new_dc)))
            outs.append(tuple(dgates_l))
        return tuple(new_carry), tuple(outs)

    finals, dgates_seq = jax.lax.scan(body, tuple(carries0), tuple(xts),
                                      unroll=unroll, reverse=True)

    d_operands = []
    for k in range(n):
        op = operands[k]
        n_layers = len(op["w_hh"])
        _, h_seq, _ = seqs[k]
        dg = dgates_seq[k]
        h_prev = tuple(
            jnp.concatenate([op["init_h"][layer][None], h_seq[layer][:-1]], 0)
            for layer in range(n_layers))
        d_operands.append({
            "xs": dg[0],
            "w_ih_rest": tuple(_grad_matmul(h_seq[layer - 1], dg[layer])
                               for layer in range(1, n_layers)),
            "w_hh": tuple(_grad_matmul(h_prev[layer], dg[layer])
                          for layer in range(n_layers)),
            "b_rest": tuple(
                dg[layer].astype(jnp.float32).sum((0, 1))
                .astype(dg[layer].dtype) for layer in range(1, n_layers)),
            "init_h": finals[k][0],
            "init_c": finals[k][1],
        })
    return (tuple(d_operands),)


_streams_core.defvjp(_streams_core_fwd, _streams_core_bwd)


# ---------------------------------------------------------------------------
# Wavefront schedule: ONE matmul per scan step for ALL (stream, layer) units.
#
# The stacked schedule above computes layer l at time t only after layer l-1
# at time t — 14 dependent (B,64)x(64,256) matmuls per step for the two
# 4-layer encoder streams, each far below one MXU tile, so the scan is pure
# sequential-launch latency. The classic staircase observation: unit (s, l)
# at scan step k can compute time t = k - l using h_{l-1}(t) — produced at
# step k-1 — so ALL units' gate matmuls at step k are independent. Both the
# recurrent input h_u and the inter-layer feed h_{u-1} live in the SAME
# packed carry h_cat (B, U*H), so the whole step is ONE
# (B, U*H) x (U*H, 4*U*H) matmul against a block-BIdiagonal weight matrix
# W_eff whose row block v carries W_hh[v] at unit-v columns and W_ih[v+1]
# at unit-(v+1) columns (U = total units). The off-(bi)diagonal zeros waste
# FLOPs the idle MXU has anyway; what matters on TPU is one launch instead
# of fourteen, and no per-step slicing/concat at sub-lane (H=64) offsets.
# Costs: D-1 extra steps (D = deepest stream) and a validity mask freezing
# each unit outside its time range [0, S). The backward exploits the same
# packing: masked dgates make dgates @ W_eff^T deliver BOTH the recurrent
# and the feed cotangents in one matmul (an invalid unit's dgates are zero,
# so its row contributes nothing and its carried dh passes through).
# ---------------------------------------------------------------------------


def _wavefront_meta(operands):
    """Static packing geometry. Units are ordered stream-major, layer-minor;
    the intra-stream feed z_inp concatenates, per stream, the h columns of
    units l=0..d-2 (they feed l=1..d-1), so the forward slice — and the
    backward scatter — are contiguous per stream."""
    H = operands[0]["w_hh"][0].shape[0]
    depths = [len(op["w_hh"]) for op in operands]
    offsets = list(np.cumsum([0] + depths[:-1]))
    U = sum(depths)
    D = max(depths)
    lvec = np.concatenate([np.arange(d) for d in depths]).astype(np.int32)
    return H, depths, offsets, U, D, lvec


def _wavefront_pack(operands, H, depths, offsets, U):
    """Pack per-unit weights into the block-bidiagonal wavefront matrix.

    W_eff is (U*H, 4*U*H): row block v (the h columns of unit v in the
    packed carry) holds W_hh[v] at unit-v's gate columns and, when unit
    v+1 is layer >= 1 of the same stream, W_ih[v+1] at unit-(v+1)'s gate
    columns — so gates = h_cat @ W_eff computes every unit's recurrent AND
    inter-layer-feed contribution in one matmul. Columns are gate-major:
    gate g of unit u lives at [g*U*H + u*H, g*U*H + (u+1)*H), so
    split(gates, 4) aligns each gate with the unit-major (B, U*H) state
    layout. Built with one einsum per part against one-hot row/column unit
    maps, not per-block scatters: the pack runs inside the train-step jit
    every call.
    """
    dtype = operands[0]["xs"].dtype
    UH = U * H

    def scatter(w_stack, row_units, col_units):
        # w_stack: (n, H, 4H) kernels; kernel j's rows land at row block
        # row_units[j], its columns at unit col_units[j]'s gate-major slots
        n = w_stack.shape[0]
        w4 = w_stack.reshape(n, H, 4, H)
        eye = np.eye(U, dtype=np.float32)
        rhot = jnp.asarray(eye[list(row_units)], dtype)
        chot = jnp.asarray(eye[list(col_units)], dtype)
        out = jnp.einsum("nhgj,nv,nu->vhguj", w4, rhot, chot)
        return out.reshape(UH, 4 * UH)

    rec = scatter(jnp.stack([w for op in operands for w in op["w_hh"]]),
                  range(U), range(U))
    feed_ws, feed_units = [], []
    for s, op in enumerate(operands):
        for l in range(1, depths[s]):
            feed_ws.append(op["w_ih_rest"][l - 1])
            feed_units.append(offsets[s] + l)
    W_eff = rec
    if feed_ws:
        W_eff = W_eff + scatter(jnp.stack(feed_ws),
                                [u - 1 for u in feed_units], feed_units)

    # biases of layers >= 1, gate-major (layer-0 bias rides inside xs)
    b4 = jnp.zeros((U, 4, H), dtype)
    for s, op in enumerate(operands):
        for l in range(1, depths[s]):
            b4 = b4.at[offsets[s] + l].set(
                op["b_rest"][l - 1].reshape(4, H))
    b_packed = jnp.swapaxes(b4, 0, 1).reshape(4 * UH)

    return W_eff, b_packed


def _wavefront_xs(operands, H, depths, offsets, U, K, S):
    """(K, B, 4*U*H) additive gate input: each stream's pre-projected xs at
    its layer-0 unit's gate-major columns for k in [0, S), zeros elsewhere
    (built by unit-axis concatenation — no big scatters)."""
    dtype = operands[0]["xs"].dtype
    B = operands[0]["xs"].shape[1]
    cols = []
    zero = None
    for u in range(U):
        hit = [s for s in range(len(operands)) if offsets[s] == u]
        if hit:
            xp = operands[hit[0]]["xs"].reshape(S, B, 4, 1, H)
            if K > S:
                xp = jnp.concatenate(
                    [xp, jnp.zeros((K - S, B, 4, 1, H), dtype)], axis=0)
            cols.append(xp)
        else:
            if zero is None:
                zero = jnp.zeros((K, B, 4, 1, H), dtype)
            cols.append(zero)
    return jnp.concatenate(cols, axis=3).reshape(K, B, 4 * U * H)


def _wavefront_scan(operands, unroll, with_residuals, impl="scan"):
    """Forward wavefront. Returns ((h_fin, c_fin) packed, per-step outputs):
    h_seq (K, B, U*H) masked states and, with_residuals, also (gates_seq,
    c_seq). impl="pallas" runs the recurrence as one pallas program with
    W_eff VMEM-resident (wavefront_pallas.wavefront_scan_pallas) instead
    of a lax.scan."""
    H, depths, offsets, U, D, lvec = _wavefront_meta(operands)
    S, B = operands[0]["xs"].shape[:2]
    K = S + D - 1
    dtype = operands[0]["xs"].dtype
    UH = U * H

    W_eff, b_packed = _wavefront_pack(operands, H, depths, offsets, U)
    xs_wave = _wavefront_xs(operands, H, depths, offsets, U, K, S)
    lvec_u = jnp.asarray(lvec)  # (U,)

    h0 = jnp.concatenate(
        [h for op in operands for h in op["init_h"]], axis=-1)
    c0 = jnp.concatenate(
        [c for op in operands for c in op["init_c"]], axis=-1)

    if impl == "pallas":
        from .wavefront_pallas import wavefront_scan_pallas
        return wavefront_scan_pallas(W_eff, b_packed, xs_wave, h0, c0,
                                     lvec, S, with_residuals)

    def step(carry, xk):
        h_cat, c_cat = carry
        xs_k, k = xk
        gates = h_cat @ W_eff + xs_k + b_packed
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        c_new = f * c_cat + i * jnp.tanh(g)
        h_new = jnp.tanh(c_new) * o
        valid = ((k >= lvec_u) & (k < S + lvec_u))  # (U,)
        m = jnp.repeat(valid, H)[None, :]
        h_out = jnp.where(m, h_new.astype(dtype), h_cat)
        c_out = jnp.where(m, c_new.astype(dtype), c_cat)
        outs = (gates, h_out, c_out) if with_residuals else h_out
        return (h_out, c_out), outs

    ks = jnp.arange(K, dtype=jnp.int32)
    (h_fin, c_fin), seq = jax.lax.scan(step, (h0, c0), (xs_wave, ks),
                                       unroll=unroll)
    return (h_fin, c_fin), seq


def _wavefront_unpack(h_fin, c_fin, h_seq, operands):
    """Slice the packed wavefront outputs back to the _streams_core output
    contract: per stream (ys (S,B,H), h_f tuple, c_f tuple)."""
    H, depths, offsets, U, D, _ = _wavefront_meta(operands)
    S = operands[0]["xs"].shape[0]
    outs = []
    for s, op in enumerate(operands):
        d, off = depths[s], offsets[s]
        top = off + d - 1
        ys = h_seq[d - 1:d - 1 + S, :, top * H:(top + 1) * H]
        h_f = tuple(h_fin[:, (off + l) * H:(off + l + 1) * H]
                    for l in range(d))
        c_f = tuple(c_fin[:, (off + l) * H:(off + l + 1) * H]
                    for l in range(d))
        outs.append((ys, h_f, c_f))
    return tuple(outs)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _wavefront_core(operands, unroll: int, impl: str = "scan"):
    """Wavefront-scheduled fused LSTM with a hand-written backward.

    The backward is the reverse wavefront: one (B, 4UH) x (4UH, UH)
    matmul per reverse step (the adjoint of the packed forward matmul),
    validity-masked dgates, and — as in _streams_core — every weight
    gradient computed OUTSIDE the scan as one MXU matmul over the whole
    (K*B) axis. Masked steps contribute zero dgates, so the packed dW picks
    up no garbage from the staircase's warm-up/drain steps.

    impl="pallas" runs both recurrences as single pallas programs with the
    packed weights VMEM-resident (see wavefront_pallas.py); "scan" is the
    lax.scan lowering. Same math, same residual layout.
    """
    (h_fin, c_fin), h_seq = _wavefront_scan(operands, unroll,
                                            with_residuals=False, impl=impl)
    return _wavefront_unpack(h_fin, c_fin, h_seq, operands)


def _wavefront_core_fwd(operands, unroll: int, impl: str):
    (h_fin, c_fin), seq = _wavefront_scan(operands, unroll,
                                          with_residuals=True, impl=impl)
    gates_seq, h_seq, c_seq = seq
    out = _wavefront_unpack(h_fin, c_fin, h_seq, operands)
    return out, (operands, gates_seq, h_seq, c_seq)


def _wavefront_core_bwd(unroll: int, impl: str, res, cts):
    operands, gates_seq, h_seq, c_seq = res
    H, depths, offsets, U, D, lvec = _wavefront_meta(operands)
    S, B = operands[0]["xs"].shape[:2]
    K = S + D - 1
    dtype = operands[0]["xs"].dtype
    UH = U * H

    W_eff, _ = _wavefront_pack(operands, H, depths, offsets, U)
    lvec_u = jnp.asarray(lvec)

    # inject dys at each stream's top-unit columns, staircase-aligned
    cols = []
    for u in range(U):
        hit = [s for s in range(len(operands))
               if offsets[s] + depths[s] - 1 == u]
        if hit:
            s = hit[0]
            dys = cts[s][0].reshape(S, B, 1, H).astype(dtype)
            pad_lo = depths[s] - 1
            pad_hi = K - S - pad_lo
            dys = jnp.pad(dys, ((pad_lo, pad_hi), (0, 0), (0, 0), (0, 0)))
            cols.append(dys)
        else:
            cols.append(jnp.zeros((K, B, 1, H), dtype))
    dY = jnp.concatenate(cols, axis=2).reshape(K, B, UH)

    dh0 = jnp.concatenate(
        [d.astype(dtype) for k in range(len(operands)) for d in cts[k][1]],
        axis=-1)
    dc0 = jnp.concatenate(
        [d.astype(dtype) for k in range(len(operands)) for d in cts[k][2]],
        axis=-1)

    h0 = jnp.concatenate(
        [h for op in operands for h in op["init_h"]], axis=-1)
    c0 = jnp.concatenate(
        [c for op in operands for c in op["init_c"]], axis=-1)
    c_prev_seq = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)

    if impl == "pallas":
        from .wavefront_pallas import wavefront_bwd_pallas
        (dh_fin, dc_fin), dgates_seq = wavefront_bwd_pallas(
            W_eff, gates_seq, c_seq, c_prev_seq, dY, dh0, dc0, lvec, S)
        return _wavefront_weight_grads(
            operands, dgates_seq, h_seq, h0, dh_fin, dc_fin,
            H, depths, offsets, U, S, B, K, dtype)

    def body(carry, xk):
        dh_c, dc_c = carry
        gates, c_k, c_prev, dy_k, k = xk
        dh_tot = dh_c + dy_k
        i, f, g, o = _lstm_gate_acts(gates)
        tc = jnp.tanh(c_k)
        do = dh_tot * tc
        dct = dc_c + dh_tot * o * (1.0 - tc * tc)
        dgates = jnp.concatenate(
            [dct * g * i * (1.0 - i),
             dct * c_prev * f * (1.0 - f),
             dct * i * (1.0 - g * g),
             do * o * (1.0 - o)], axis=-1)
        valid = ((k >= lvec_u) & (k < S + lvec_u))
        m4 = jnp.tile(jnp.repeat(valid, H), 4)[None, :]
        dgates = jnp.where(m4, dgates, jnp.zeros_like(dgates))
        # masked dgates make this ONE matmul exact: for a valid unit v the
        # row is dgates_v Whh[v]^T + dgates_{v+1} Wih[v+1]^T (recurrent +
        # feed cotangents); for an invalid v, dgates_v = 0 leaves only the
        # feed term, and the carried dh_tot passes through via the where.
        dz = dgates @ W_eff.T
        m = jnp.repeat(valid, H)[None, :]
        dh_new = dz + jnp.where(m, jnp.zeros_like(dh_tot), dh_tot)
        dc_new = jnp.where(m, dct * f, dc_c)
        return (dh_new, dc_new), dgates

    ks = jnp.arange(K, dtype=jnp.int32)
    (dh_fin, dc_fin), dgates_seq = jax.lax.scan(
        body, (dh0, dc0), (gates_seq, c_seq, c_prev_seq, dY, ks),
        unroll=unroll, reverse=True)
    return _wavefront_weight_grads(
        operands, dgates_seq, h_seq, h0, dh_fin, dc_fin,
        H, depths, offsets, U, S, B, K, dtype)


def _wavefront_weight_grads(operands, dgates_seq, h_seq, h0, dh_fin, dc_fin,
                            H, depths, offsets, U, S, B, K, dtype):
    # weight gradients: one matmul over the whole (K*B) axis. Masked-out
    # steps contribute zero dgates, so the bidiagonal dW_eff picks up no
    # garbage; the recurrent grad of unit u is its (row u, col u) block and
    # the feed grad of unit u its (row u-1, col u) block — disjoint slots.
    h_prev_seq = jnp.concatenate([h0[None], h_seq[:-1]], axis=0)
    dW_eff = _grad_matmul(h_prev_seq, dgates_seq)  # (UH, 4UH)

    dg4 = dgates_seq.reshape(K, B, 4, U, H)
    db_units = dg4.astype(jnp.float32).sum((0, 1))  # (4, U, H)

    def unit_block(row_u, col_u):
        # rows of unit row_u, gate-major columns of unit col_u
        blk = dW_eff[row_u * H:(row_u + 1) * H].reshape(H, 4, U, H)
        return blk[:, :, col_u, :].reshape(H, 4 * H)

    d_operands = []
    for s, op in enumerate(operands):
        d, off = depths[s], offsets[s]
        u0 = off
        dxs = dg4[:S, :, :, u0, :].reshape(S, B, 4 * H)
        dw_ih = [unit_block(off + l - 1, off + l) for l in range(1, d)]
        dw_hh = tuple(unit_block(off + l, off + l) for l in range(d))
        db = tuple(db_units[:, off + l, :].reshape(4 * H).astype(dtype)
                   for l in range(1, d))
        d_operands.append({
            "xs": dxs,
            "w_ih_rest": tuple(dw_ih),
            "w_hh": dw_hh,
            "b_rest": db,
            "init_h": tuple(
                dh_fin[:, (off + l) * H:(off + l + 1) * H]
                for l in range(d)),
            "init_c": tuple(
                dc_fin[:, (off + l) * H:(off + l + 1) * H]
                for l in range(d)),
        })
    return (tuple(d_operands),)


_wavefront_core.defvjp(_wavefront_core_fwd, _wavefront_core_bwd)


def run_lstm_streams(streams: Sequence["LSTMStream"], unroll: int = 16,
                     custom_grad: bool = True, schedule: str = "stacked"):
    """Run N independent prepared LSTM streams in ONE lax.scan.

    TPU rationale: each per-step matmul is (B, H)x(H, 4H) with H=64 — far
    below one MXU tile — so a seq-300 LSTM is pure sequential-iteration
    latency, and XLA executes independent scans SEQUENTIALLY (one TPU
    program, no streams). The two encoder LSTMs of SeqVaeTeb therefore cost
    two full scan latencies when run separately; fusing them into one scan
    body halves the sequential iteration count in the forward AND the
    backward pass. With custom_grad (default), the backward pass uses the
    hand-written out-of-scan weight-gradient factorization of
    `_streams_core`; custom_grad=False keeps plain autodiff (the oracle the
    custom VJP is tested against).

    Returns [(ys (B,S,H), (h_stack, c_stack)), ...] matching LSTM.__call__.
    """
    operands = tuple(
        {"xs": jnp.swapaxes(st.x_proj, 0, 1),
         "w_ih_rest": tuple(st.w_ih[1:]),
         "w_hh": tuple(st.w_hh),
         "b_rest": tuple(st.biases[1:]),
         "init_h": st.init[0],
         "init_c": st.init[1]}
        for st in streams)
    if schedule in ("wavefront", "wavefront_pallas"):
        hs = {st.w_hh[0].shape[0] for st in streams}
        if len(hs) != 1:
            raise ValueError(
                f"wavefront schedule needs one shared hidden size, got {hs}")
        impl = "pallas" if schedule == "wavefront_pallas" else "scan"
        outs = _wavefront_core(operands, unroll, impl)
    elif custom_grad:
        outs = _streams_core(operands, unroll)
    else:
        finals, ys = _streams_scan(operands, unroll, with_residuals=False)
        outs = tuple((y, h_f, c_f) for y, (h_f, c_f) in zip(ys, finals))
    return [(jnp.swapaxes(y, 0, 1), (jnp.stack(h_f), jnp.stack(c_f)))
            for (y, h_f, c_f) in outs]


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM over (B, S, C), ONE lax.scan total.

    Orthogonal kernels, zero biases with forget gate bias = 1
    (reference initialization, vae_teb_model.py:60-70).

    TPU design note: a seq-300 4-layer LSTM is latency-bound — the matmuls
    are (B, H)x(H, 4H) with H=64, far below one MXU tile, so time is pure
    sequential-iteration overhead. Stacking the layers inside a single scan
    body (layer l at step t needs only layer l-1 at step t — no wavefront
    required) cuts the iteration count num_layers-fold vs one scan per
    layer, and `unroll` shrinks it further. Layer 0's input projection is
    still hoisted out as one large (B*S, C)x(C, 4H) matmul; deeper layers
    project inside the body ((B,H)x(H,4H) — the same tile class as the
    recurrent matmul they sit next to). For multiple independent LSTMs in
    one program, pass prepare=True and fuse via run_lstm_streams.
    """
    hidden_size: int
    num_layers: int = 1
    # scan unroll: higher shrinks sequential-step overhead on TPU but
    # multiplies the compiled graph size (v5e sweep on TargetEncoder
    # fwd+bwd, batch 32: 4 -> 3.96 ms, 8 -> 4.15, 16 -> 3.62, 30 -> 4.15)
    unroll: int = 16
    # "stacked" (layer-sequential body), "wavefront" (staircase: one
    # block-bidiagonal matmul per step for all layers — see
    # _wavefront_core), or "wavefront_pallas" (same schedule as one pallas
    # program, weights VMEM-resident — see wavefront_pallas.py)
    schedule: str = "stacked"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 initial_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
                 = None, prepare: bool = False):
        """initial_state: optional (h, c), each (num_layers, B, H) — carried
        hidden/cell state for streaming inference. Defaults to zeros (the
        full-sequence convention). Returns (outputs, (h, c)) with the final
        state in the same stacked layout, so the return value chains
        directly into the next call.

        prepare=True returns an LSTMStream instead of scanning — the caller
        fuses several streams into one scan with run_lstm_streams (numerics
        identical: the fused body runs this module's exact cell math)."""
        b, s, _ = x.shape
        h_size = self.hidden_size

        def forget_one_bias(key, shape, dtype=jnp.float32):
            bias = jnp.zeros(shape, dtype)
            return bias.at[h_size:2 * h_size].set(1.0)

        w_ih, w_hh, biases = [], [], []
        in_dim = x.shape[-1]
        for layer in range(self.num_layers):
            w_ih.append(self.param(f"w_ih_{layer}", orthogonal(),
                                   (in_dim, 4 * h_size)))
            w_hh.append(self.param(f"w_hh_{layer}", orthogonal(),
                                   (h_size, 4 * h_size)))
            biases.append(self.param(f"bias_{layer}", forget_one_bias,
                                     (4 * h_size,)))
            in_dim = h_size

        if self.dtype is not None:
            # compute-precision policy: params are stored fp32, the scan
            # body runs in self.dtype (bf16 keeps the recurrent matmuls on
            # the MXU's native path)
            x = x.astype(self.dtype)
            w_ih = [w.astype(self.dtype) for w in w_ih]
            w_hh = [w.astype(self.dtype) for w in w_hh]
            biases = [b.astype(self.dtype) for b in biases]

        # hoist layer 0's input projection out of the scan
        x_proj = x.reshape(b * s, x.shape[-1]) @ w_ih[0]
        x_proj = (x_proj + biases[0]).reshape(b, s, 4 * h_size)

        if initial_state is None:
            zeros = jnp.zeros((b, h_size), x.dtype)
            init = (tuple(zeros for _ in range(self.num_layers)),
                    tuple(zeros for _ in range(self.num_layers)))
        else:
            h0, c0 = initial_state
            init = (tuple(h0[l].astype(x.dtype)
                          for l in range(self.num_layers)),
                    tuple(c0[l].astype(x.dtype)
                          for l in range(self.num_layers)))

        stream = LSTMStream(x_proj, w_ih, w_hh, biases, init)
        if prepare:
            return stream
        return run_lstm_streams([stream], unroll=self.unroll,
                                schedule=self.schedule)[0]
