"""Forecast decoder variants, predict-st family, LDAM loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_teb_tpu.models import (SeqVaeTebForecast, SeqVaeTebPredictSt,
                                future_window_targets, ldam_loss,
                                predict_st_loss, sliding_window_nll)

CPU = None
S = 16


def setup_module(module):
    global CPU
    CPU = jax.devices("cpu")[0]


def _inputs(rng, b=2):
    return (jnp.asarray(rng.standard_normal((b, S, 43)), jnp.float32),
            jnp.asarray(rng.standard_normal((b, S, 44)), jnp.float32),
            jnp.asarray(rng.standard_normal((b, S, 130)), jnp.float32))


def test_sliding_window_nll_matches_loop(rng):
    """Vectorized window NLL == the reference's per-timestep loop."""
    b, s, h, dec, warmup = 2, 12, 32, 16, 3
    length = s * dec + h  # all t valid after warmup
    mu = rng.standard_normal((b, s, h)).astype(np.float32)
    lv = (0.3 * rng.standard_normal((b, s, h))).astype(np.float32)
    raw = rng.standard_normal((b, length)).astype(np.float32)
    with jax.default_device(CPU):
        got = float(sliding_window_nll(jnp.asarray(mu), jnp.asarray(lv),
                                       jnp.asarray(raw), warmup, dec))
    total, count = 0.0, 0
    for t in range(warmup, s):
        start = t * dec
        if start + h <= length:
            w = raw[:, start:start + h]
            nll = 0.5 * (lv[:, t] + (w - mu[:, t]) ** 2 / np.exp(lv[:, t]))
            total += nll.mean()
            count += 1
    np.testing.assert_allclose(got, total / count, rtol=1e-5)


def test_sliding_window_nll_empty():
    with jax.default_device(CPU):
        out = sliding_window_nll(jnp.zeros((1, 4, 8)), jnp.zeros((1, 4, 8)),
                                 jnp.zeros((1, 16)), warmup_period=10)
    assert float(out) == 0.0


def test_future_window_targets(rng):
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 12, 2))
    with jax.default_device(CPU):
        w = np.asarray(future_window_targets(x, horizon=3))
    assert w.shape == (1, 9, 3, 2)
    # window at t=0 holds steps 1..3
    np.testing.assert_array_equal(w[0, 0, :, 0], [2, 4, 6])


@pytest.mark.parametrize("decoder_type", ["direct", "conv_window"])
def test_forecast_variant_forward_and_loss(decoder_type, rng):
    with jax.default_device(CPU):
        model = SeqVaeTebForecast(decoder_type=decoder_type,
                                  prediction_horizon=64)
        key = jax.random.PRNGKey(0)
        y_st, y_ph, x_ph = _inputs(rng)
        v = model.init({"params": key, "sample": key}, y_st, y_ph, x_ph,
                       train=False)
        out, _ = model.apply(v, y_st, y_ph, x_ph, train=True,
                             rngs={"sample": key}, mutable=["batch_stats"])
        assert out["window_mu"].shape == (2, S, 64)
        raw = jnp.asarray(rng.standard_normal((2, S * 16)), jnp.float32)
        losses = SeqVaeTebForecast.compute_loss(out, raw, beta=1e-5,
                                                warmup_period=2)
    assert np.isfinite(float(losses["total_loss"]))
    assert float(losses["nll_loss"]) != 0.0
    # the full-reconstruction decoder must NOT have materialized params
    assert "decoder" not in v["params"]


def test_predict_st_variant(rng):
    with jax.default_device(CPU):
        model = SeqVaeTebPredictSt(prediction_horizon=4)
        key = jax.random.PRNGKey(1)
        y_st, y_ph, x_ph = _inputs(rng)
        v = model.init({"params": key, "sample": key}, y_st, y_ph, x_ph,
                       train=False)
        out, _ = model.apply(v, y_st, y_ph, x_ph, train=True,
                             rngs={"sample": key}, mutable=["batch_stats"])
        assert out["scattering_mu"].shape == (2, S, 4, 43)
        assert out["phase_harmonic_logvar"].shape == (2, S, 4, 44)
        losses = SeqVaeTebPredictSt.compute_loss(out, y_st, y_ph, beta=1e-5,
                                                 warmup_period=2)
    for k in ("total_loss", "scattering_loss", "phase_loss", "kld_loss"):
        assert np.isfinite(float(losses[k])), k


def test_predict_st_acceptance_battery(rng):
    """The scattering-domain acceptance test runs end-to-end on the real
    predict-st variant (reference seqvae_prediction_accuracy_test,
    predict_st graph_model.py:1115)."""
    from vae_teb_tpu.eval import prediction_accuracy_test
    with jax.default_device(CPU):
        model = SeqVaeTebPredictSt(prediction_horizon=4)
        key = jax.random.PRNGKey(2)
        y_st, y_ph, x_ph = _inputs(rng)
        v = model.init({"params": key, "sample": key}, y_st, y_ph, x_ph,
                       train=False)
        batch = {"fhr_st": np.asarray(y_st), "fhr_ph": np.asarray(y_ph),
                 "fhr_up_ph": np.asarray(x_ph)}
        res = prediction_accuracy_test(model, v, [batch], prediction_idx=4)
    n, c_st, c_ph = y_st.shape[0], y_st.shape[2], y_ph.shape[2]
    assert res["scattering_mse"].shape == (n, c_st)
    assert res["phase_mse"].shape == (n, c_ph)
    assert res["scattering_vaf"].shape == (c_st,)
    for k, val in res.items():
        assert np.all(np.isfinite(val)), k


def test_predict_st_loss_warmup_guard(rng):
    preds = {k: jnp.zeros((1, 8, 6, 3)) for k in
             ("scattering_mu", "scattering_logvar",
              "phase_harmonic_mu", "phase_harmonic_logvar")}
    with jax.default_device(CPU):
        out = predict_st_loss(preds, jnp.zeros((1, 8, 3)),
                              jnp.zeros((1, 8, 3)), warmup_period=5)
    assert float(out["total_loss"]) == 0.0  # 5 >= 8-6: nothing valid


def test_ldam_loss_margins(rng):
    logits = jnp.asarray(rng.standard_normal((16, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 16))
    with jax.default_device(CPU):
        # balanced classes: equal margins == scaled CE with uniform margin
        l_bal = float(ldam_loss(logits, labels, [100, 100]))
        # rare class 1 gets the max margin -> loss changes
        l_imb = float(ldam_loss(logits, labels, [1000, 10]))
    assert np.isfinite(l_bal) and np.isfinite(l_imb)
    assert abs(l_bal - l_imb) > 1e-4


def test_ldam_reduces_to_scaled_ce_when_margin_zero(rng):
    logits = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, 8))
    with jax.default_device(CPU):
        got = float(ldam_loss(logits, labels, [10, 10, 10], max_m=0.0, s=1.0))
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = float(-jnp.take_along_axis(logp, labels[:, None], axis=-1).mean())
    np.testing.assert_allclose(got, ce, rtol=1e-6)
