"""Model family: shapes, causality, loss math, classifier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_teb_tpu.models import (LSTM, ResidualMLP, SeqVaeTeb,
                                SeqVaeTebClassifier, SourceEncoder,
                                gaussian_kld, gaussian_nll,
                                geometric_schedule, stitch_predictions)

CPU = None


def setup_module(module):
    global CPU
    CPU = jax.devices("cpu")[0]


def _on_cpu(fn, *args, **kwargs):
    with jax.default_device(CPU):
        return fn(*args, **kwargs)


@pytest.fixture(scope="module")
def small_model_state():
    model = SeqVaeTeb()
    rng = jax.random.PRNGKey(0)
    S = 16
    with jax.default_device(jax.devices("cpu")[0]):
        y_st = jnp.asarray(np.random.default_rng(0).standard_normal((2, S, 43)), jnp.float32)
        y_ph = jnp.asarray(np.random.default_rng(1).standard_normal((2, S, 44)), jnp.float32)
        x_ph = jnp.asarray(np.random.default_rng(2).standard_normal((2, S, 130)), jnp.float32)
        variables = model.init({"params": rng, "sample": rng},
                               y_st, y_ph, x_ph, train=False)
    return model, variables, (y_st, y_ph, x_ph)


def test_geometric_schedule_reference_semantics():
    # identical to the reference formula (vae_teb_model.py:11-44)
    def ref(input_size, output_size, n_hidden):
        steps = n_hidden + 1
        r = (output_size / input_size) ** (1 / steps)
        sizes = [input_size]
        cur = r
        for _ in range(n_hidden):
            sizes.append(int(round(input_size * cur)))
            cur *= r
        sizes.append(output_size)
        return tuple(sizes[1:])

    for args in [(43, 16, 4), (44, 16, 4), (130, 32, 5), (64, 32, 8),
                 (32, 32, 32), (32, 50, 5), (50, 87, 5), (64, 32, 5)]:
        assert geometric_schedule(*args) == ref(*args), args


def test_residual_mlp_shapes():
    m = ResidualMLP((24, 16), final_activation=False)
    with jax.default_device(CPU):
        x = jnp.ones((2, 8, 32))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
    assert y.shape == (2, 8, 16)
    assert "skip_proj" in v["params"]  # 32 != 16 needs projection


def test_lstm_matches_numpy_oracle():
    """lax.scan LSTM == hand-rolled numpy LSTM with the same params."""
    with jax.default_device(CPU):
        m = LSTM(hidden_size=5, num_layers=2, unroll=1)
        x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 7, 4)),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(1), x)
        y, (h, c) = m.apply(v, x)
    assert y.shape == (2, 7, 5) and h.shape == (2, 2, 5)

    def sigmoid(a):
        return 1.0 / (1.0 + np.exp(-a))

    xin = np.asarray(x)
    p = jax.device_get(v["params"])
    for layer in range(2):
        w_ih, w_hh = p[f"w_ih_{layer}"], p[f"w_hh_{layer}"]
        bias = p[f"bias_{layer}"]
        hh = np.zeros((2, 5))
        cc = np.zeros((2, 5))
        outs = []
        for t in range(7):
            gates = xin[:, t] @ w_ih + hh @ w_hh + bias
            i, f, g, o = np.split(gates, 4, axis=-1)
            i, f, o = sigmoid(i), sigmoid(f), sigmoid(o)
            cc = f * cc + i * np.tanh(g)
            hh = o * np.tanh(cc)
            outs.append(hh)
        xin = np.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y), xin, atol=1e-5)


def test_lstm_custom_vjp_matches_autodiff():
    """The hand-written out-of-scan weight-gradient backward of
    run_lstm_streams (blocks._streams_core) must reproduce plain autodiff
    through the same scan — values bit-equal, every gradient leaf to fp32
    reduction-order tolerance. Exercises BOTH streams, all weight/bias
    leaves, the scanned inputs, AND the final-state cotangents."""
    from vae_teb_tpu.models.blocks import LSTMStream, run_lstm_streams

    B, S, H, L = 3, 17, 8, 4
    with jax.default_device(CPU):
        def mk(seed, n_layers):
            r = np.random.default_rng(seed)
            f32 = lambda *s: jnp.asarray(
                r.standard_normal(s).astype(np.float32))
            return dict(
                xp=f32(B, S, 4 * H),
                w_ih=[f32(H if l else 12, 4 * H) * 0.3
                      for l in range(n_layers)],
                w_hh=[f32(H, 4 * H) * 0.3 for _ in range(n_layers)],
                b=[f32(4 * H) * 0.1 for _ in range(n_layers)],
                init=(tuple(f32(B, H) * 0.2 for _ in range(n_layers)),
                      tuple(f32(B, H) * 0.2 for _ in range(n_layers))))

        s1, s2 = mk(1, L), mk(2, 2)  # different layer counts per stream

        def run(leaves, custom):
            xp1, whh1, wih1, b1, h01, c01 = leaves
            st1 = LSTMStream(xp1, [s1["w_ih"][0]] + list(wih1), list(whh1),
                             [s1["b"][0]] + list(b1), (h01, c01))
            st2 = LSTMStream(s2["xp"], s2["w_ih"], s2["w_hh"], s2["b"],
                             s2["init"])
            (y1, (hf1, cf1)), (y2, (hf2, cf2)) = run_lstm_streams(
                [st1, st2], unroll=4, custom_grad=custom)
            return (jnp.sum(y1 ** 2) + jnp.sum(jnp.cos(y2))
                    + 0.7 * jnp.sum(hf1) + 0.3 * jnp.sum(cf1 ** 2)
                    + 0.1 * jnp.sum(hf2) + 0.2 * jnp.sum(cf2))

        leaves = (s1["xp"], tuple(s1["w_hh"]), tuple(s1["w_ih"][1:]),
                  tuple(s1["b"][1:]), s1["init"][0], s1["init"][1])
        v_c, g_c = jax.value_and_grad(lambda lv: run(lv, True))(leaves)
        v_a, g_a = jax.value_and_grad(lambda lv: run(lv, False))(leaves)
    assert float(v_c) == float(v_a)  # primal path is the same scan
    for a, c in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("wf_schedule", ["wavefront", "wavefront_pallas"])
def test_lstm_wavefront_matches_stacked(wf_schedule):
    """The wavefront schedule (blocks._wavefront_core: one block-bidiagonal
    matmul per scan step over ALL (stream, layer) units, staircase time
    offsets, validity-masked warm-up/drain) must reproduce the stacked
    schedule exactly: same outputs/final states, and its hand-written
    backward must match autodiff of the stacked scan on every leaf —
    weights, biases, scanned inputs, initial states, AND final-state
    cotangents. Exercises heterogeneous layer counts (4 and 2), in both
    the lax.scan lowering and the pallas kernel (interpret mode on CPU)."""
    from vae_teb_tpu.models.blocks import LSTMStream, run_lstm_streams

    B, S, H = 3, 17, 8
    with jax.default_device(CPU):
        def mk(seed, n_layers):
            r = np.random.default_rng(seed)
            f32 = lambda *s: jnp.asarray(
                r.standard_normal(s).astype(np.float32))
            return dict(
                xp=f32(B, S, 4 * H),
                w_ih=[f32(H if l else 12, 4 * H) * 0.3
                      for l in range(n_layers)],
                w_hh=[f32(H, 4 * H) * 0.3 for _ in range(n_layers)],
                b=[f32(4 * H) * 0.1 for _ in range(n_layers)],
                init=(tuple(f32(B, H) * 0.2 for _ in range(n_layers)),
                      tuple(f32(B, H) * 0.2 for _ in range(n_layers))))

        s1, s2 = mk(1, 4), mk(2, 2)

        def run(leaves, schedule):
            xp1, whh1, wih1, b1, h01, c01, xp2 = leaves
            st1 = LSTMStream(xp1, [s1["w_ih"][0]] + list(wih1), list(whh1),
                             [s1["b"][0]] + list(b1), (h01, c01))
            st2 = LSTMStream(xp2, s2["w_ih"], s2["w_hh"], s2["b"],
                             s2["init"])
            (y1, (hf1, cf1)), (y2, (hf2, cf2)) = run_lstm_streams(
                [st1, st2], unroll=4, custom_grad=False, schedule=schedule)
            loss = (jnp.sum(y1 ** 2) + jnp.sum(jnp.cos(y2))
                    + 0.7 * jnp.sum(hf1) + 0.3 * jnp.sum(cf1 ** 2)
                    + 0.1 * jnp.sum(hf2) + 0.2 * jnp.sum(cf2))
            return loss, (y1, y2, hf1, cf1, hf2, cf2)

        leaves = (s1["xp"], tuple(s1["w_hh"]), tuple(s1["w_ih"][1:]),
                  tuple(s1["b"][1:]), s1["init"][0], s1["init"][1],
                  s2["xp"])
        (va, out_s), ga = jax.value_and_grad(
            lambda lv: run(lv, "stacked"), has_aux=True)(leaves)
        (vw, out_w), gw = jax.value_and_grad(
            lambda lv: run(lv, wf_schedule), has_aux=True)(leaves)
    for a, b in zip(out_s, out_w):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(vw), float(va), rtol=1e-6)
    for a, w in zip(jax.tree.leaves(ga), jax.tree.leaves(gw)):
        np.testing.assert_allclose(np.asarray(w), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_lstm_wavefront_pallas_sharded_grads(cpu_mesh_devices):
    """wavefront_pallas on a >1-device mesh: the kernels run per batch
    shard under shard_map (wavefront_pallas._batch_mesh reads the abstract
    mesh off the traced avals), and the result — outputs AND every grad
    leaf — must match the XLA wavefront on the same sharded inputs."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from vae_teb_tpu.models.blocks import LSTMStream, run_lstm_streams

    B, S, H = 8, 9, 8
    mesh = Mesh(np.array(cpu_mesh_devices), ("data",))
    r = np.random.default_rng(5)
    f32 = lambda *s: jnp.asarray(r.standard_normal(s).astype(np.float32))
    w_ih = [f32(H if l else 12, 4 * H) * 0.3 for l in range(3)]
    w_hh = [f32(H, 4 * H) * 0.3 for _ in range(3)]
    b = [f32(4 * H) * 0.1 for _ in range(3)]
    batch_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    xp = jax.device_put(f32(B, S, 4 * H), batch_sh)
    init = (tuple(jax.device_put(f32(B, H) * 0.2, batch_sh) for _ in range(3)),
            tuple(jax.device_put(f32(B, H) * 0.2, batch_sh) for _ in range(3)))
    weights = jax.device_put((w_ih, w_hh, b), rep)

    def run(schedule):
        def loss_fn(leaves, xp):
            w_ih, w_hh, b = leaves
            st = LSTMStream(xp, list(w_ih), list(w_hh), list(b), init)
            (y, (hf, cf)), = run_lstm_streams([st], unroll=4,
                                              schedule=schedule)
            return jnp.sum(y ** 2) + 0.5 * jnp.sum(hf) + 0.2 * jnp.sum(cf)
        return jax.jit(jax.value_and_grad(loss_fn))(weights, xp)

    v_x, g_x = run("wavefront")
    v_p, g_p = run("wavefront_pallas")
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-6)
    for a, p in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_lstm_forget_bias_init():
    with jax.default_device(CPU):
        m = LSTM(hidden_size=4, num_layers=1)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 3, 2)))
    bias = np.asarray(v["params"]["bias_0"])
    np.testing.assert_array_equal(bias[4:8], 1.0)  # forget gate
    np.testing.assert_array_equal(bias[:4], 0.0)


def test_source_encoder_causal():
    """Output at step t must not change when inputs after t change."""
    with jax.default_device(CPU):
        m = SourceEncoder()
        rng = np.random.default_rng(5)
        x = rng.standard_normal((1, 20, 130)).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        base = m.apply(v, jnp.asarray(x), train=False,
                       mutable=["batch_stats"])[0]
        x2 = x.copy()
        # random perturbation (a constant shift would vanish in LayerNorm)
        x2[:, 12:, :] += rng.standard_normal(x2[:, 12:, :].shape).astype(np.float32)
        pert = m.apply(v, jnp.asarray(x2), train=False,
                       mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(base)[:, :12],
                               np.asarray(pert)[:, :12], atol=1e-5)
    assert np.abs(np.asarray(base)[:, 12:] - np.asarray(pert)[:, 12:]).max() > 1e-3


def test_source_encoder_streaming_matches_full():
    """encode_source_stream chained over uneven chunks must reproduce the
    full-sequence encoding exactly — the incremental-serving contract
    (reference SourceEncoder.get_sequence_encoding,
    vae_teb_model.py:723-740, recomputes the full forward; this API carries
    conv tails + LSTM (h, c) instead)."""
    from vae_teb_tpu.models import source_stream_init_state
    with jax.default_device(CPU):
        m = SourceEncoder()
        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, 24, 130)).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        full = np.asarray(m.apply(v, jnp.asarray(x), train=False))

        state = source_stream_init_state(2)
        outs = []
        for lo, hi in ((0, 5), (5, 6), (6, 15), (15, 24)):  # uneven chunks
            mu, state = m.apply(v, jnp.asarray(x[:, lo:hi]), state,
                                method="stream")
            outs.append(np.asarray(mu))
        np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                                   rtol=0, atol=1e-5)

        # reference-parity slice API
        sl = np.asarray(m.apply(v, jnp.asarray(x), 9,
                                method="get_sequence_encoding"))
        np.testing.assert_allclose(sl, full[:, :10], atol=1e-6)


def test_seqvaeteb_streaming_api(small_model_state):
    """The SeqVaeTeb-level wrappers route to the source encoder with the
    model's own variables."""
    model, variables, (y_st, y_ph, x_ph) = small_model_state
    from vae_teb_tpu.models import SeqVaeTeb  # noqa: F401 (clarity)
    with jax.default_device(CPU):
        enc = model.apply(variables, y_st, y_ph, x_ph, train=False,
                          method="encode")
        state = model.init_source_stream_state(x_ph.shape[0])
        mu1, state = model.apply(variables, x_ph[:, :7], state,
                                 method="encode_source_stream")
        mu2, state = model.apply(variables, x_ph[:, 7:], state,
                                 method="encode_source_stream")
        stream = np.concatenate([np.asarray(mu1), np.asarray(mu2)], axis=1)
    np.testing.assert_allclose(stream, np.asarray(enc["mu_x"]), atol=1e-5)


def test_seqvaeteb_forward_and_loss(small_model_state):
    model, variables, (y_st, y_ph, x_ph) = small_model_state
    with jax.default_device(CPU):
        out, _ = model.apply(variables, y_st, y_ph, x_ph, train=True,
                             rngs={"sample": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        S = y_st.shape[1]
        assert out["z"].shape == (2, S, 32)
        assert out["linear_output"].shape == (2, S, 87)
        assert out["mu_pr"].shape == (2, S * 16)
        y_raw = jnp.ones((2, S * 16))
        losses = SeqVaeTeb.compute_loss(out, y_st, y_ph, y_raw, beta=1e-5)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["kld_loss"]) > 0  # random inputs => nonzero TE


def test_deterministic_uses_posterior_mean(small_model_state):
    model, variables, (y_st, y_ph, x_ph) = small_model_state
    with jax.default_device(CPU):
        out = model.apply(variables, y_st, y_ph, x_ph, train=False,
                          deterministic=True)
    np.testing.assert_array_equal(np.asarray(out["z"]),
                                  np.asarray(out["mu_post"]))


def test_grads_flow_everywhere(small_model_state):
    model, variables, (y_st, y_ph, x_ph) = small_model_state

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            y_st, y_ph, x_ph, train=True,
            rngs={"sample": jax.random.PRNGKey(3)}, mutable=["batch_stats"])
        return SeqVaeTeb.compute_loss(out, y_st, y_ph,
                                      jnp.ones((2, y_st.shape[1] * 16)),
                                      beta=1.0)["total_loss"]

    with jax.default_device(CPU):
        grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)
    assert nonzero / len(leaves) > 0.9  # nearly every param receives grad


def test_transfer_entropy(small_model_state):
    model, variables, (y_st, y_ph, x_ph) = small_model_state
    with jax.default_device(CPU):
        te = model.apply(variables, y_st, y_ph, x_ph,
                         method=model.measure_transfer_entropy)
        te_scalar = model.apply(variables, y_st, y_ph, x_ph,
                                reduce_mean=True,
                                method=model.measure_transfer_entropy)
    assert te.shape == (2, y_st.shape[1], 32)
    assert np.all(np.asarray(te) >= -1e-5)  # KL >= 0
    assert float(te_scalar) >= 0


def test_kld_analytic_vs_montecarlo():
    """Spot-check the closed-form KL against sampling."""
    rng = np.random.default_rng(0)
    mu_p, lv_p = rng.standard_normal(4), rng.standard_normal(4) * 0.3
    mu_q, lv_q = rng.standard_normal(4), rng.standard_normal(4) * 0.3
    with jax.default_device(CPU):
        analytic = float(gaussian_kld(jnp.asarray(mu_p), jnp.asarray(lv_p),
                                      jnp.asarray(mu_q), jnp.asarray(lv_q),
                                      reduce_mean=False).sum())
    z = rng.standard_normal((200000, 4)) * np.exp(0.5 * lv_q) + mu_q
    logq = -0.5 * (lv_q + (z - mu_q) ** 2 / np.exp(lv_q) + np.log(2 * np.pi))
    logp = -0.5 * (lv_p + (z - mu_p) ** 2 / np.exp(lv_p) + np.log(2 * np.pi))
    mc = float((logq - logp).sum(-1).mean())
    assert abs(analytic - mc) < 0.05 * max(1.0, abs(mc))


def test_gaussian_nll_matches_formula():
    with jax.default_device(CPU):
        mu = jnp.zeros((2, 4))
        logvar = jnp.zeros((2, 4))
        target = jnp.ones((2, 4))
        assert abs(float(gaussian_nll(mu, logvar, target)) - 0.5) < 1e-6


def test_stitch_predictions():
    """Stitcher averages overlapping windows onto the raw grid."""
    b, n, c, stride = 1, 10, 32, 16
    new_len = n * stride
    with jax.default_device(CPU):
        x = jnp.ones((b, n, c))
        stacked, mean = stitch_predictions(x, stride=stride, new_len=new_len)
        assert mean.shape == (b, new_len)
        np.testing.assert_allclose(np.asarray(mean), 1.0, atol=1e-6)
        # constant-per-step values: position j averages steps j//16-k
        vals = jnp.asarray(np.arange(n, dtype=np.float32))[None, :, None] * jnp.ones((b, n, c))
        _, mean2 = stitch_predictions(vals, stride=stride, new_len=new_len)
        m = np.asarray(mean2)[0]
    # at j=0 only step 0 contributes
    assert m[0] == 0.0
    # at j=31 steps 0 and 1 contribute -> 0.5
    np.testing.assert_allclose(m[31], 0.5, atol=1e-6)


def test_classifier_forward():
    with jax.default_device(CPU):
        model = SeqVaeTebClassifier(num_classes=2, classifier_depth=3,
                                    use_attention=True)
        rng = jax.random.PRNGKey(0)
        S = 16
        args = (jnp.ones((2, S, 43)), jnp.ones((2, S, 44)),
                jnp.ones((2, S, 130)))
        v = model.init({"params": rng, "sample": rng, "dropout": rng},
                       *args, train=False)
        out = model.apply(v, *args, train=False,
                          rngs={"sample": rng})
        losses = SeqVaeTebClassifier.compute_loss(
            out, jnp.asarray([0, 1]))
    assert out["logits"].shape == (2, 2)
    assert out["predictions"].shape == (2,)
    np.testing.assert_allclose(np.asarray(out["probabilities"]).sum(-1), 1.0,
                               rtol=1e-5)
    assert np.isfinite(float(losses["total_loss"]))


def test_classifier_freeze_vae_blocks_grads():
    with jax.default_device(CPU):
        model = SeqVaeTebClassifier(freeze_vae=True, classifier_depth=3,
                                    use_attention=False)
        rng = jax.random.PRNGKey(0)
        S = 8
        args = (jnp.ones((1, S, 43)), jnp.ones((1, S, 44)),
                jnp.ones((1, S, 130)))
        v = model.init({"params": rng, "sample": rng, "dropout": rng},
                       *args, train=False)

        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                *args, train=False, rngs={"sample": rng})
            return SeqVaeTebClassifier.compute_loss(
                out, jnp.asarray([1]))["total_loss"]

        grads = jax.grad(loss_fn)(v["params"])
    vae_grad = float(sum(np.abs(np.asarray(g)).sum()
                         for g in jax.tree.leaves(grads["vae_model"])))
    cls_grad = float(sum(np.abs(np.asarray(g)).sum()
                         for g in jax.tree.leaves(grads["classifier"])))
    assert vae_grad == 0.0
    assert cls_grad > 0.0
