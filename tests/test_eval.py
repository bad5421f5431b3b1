"""Evaluation suite: metrics oracles, TE analyses, end-to-end artifacts."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_teb_tpu.data import (CombinedHDF5Dataset, DatasetStatsCalculator,
                              build_dataset)
from vae_teb_tpu.eval import (ModelEvaluator, calculate_vaf,
                              gaussian_log_likelihood,
                              gaussian_mutual_information,
                              histogram_mutual_information,
                              interpolate_latent, reconstruction_metrics,
                              run_evaluation_suite)
from vae_teb_tpu.models import SeqVaeTeb
from vae_teb_tpu.ops import PhaseScattering1D

CPU = None


def setup_module(module):
    global CPU
    CPU = jax.devices("cpu")[0]


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_reconstruction_metrics_oracle(rng):
    x = rng.standard_normal((4, 256)).astype(np.float32)
    noise = 0.1 * rng.standard_normal((4, 256)).astype(np.float32)
    with jax.default_device(CPU):
        m = {k: np.asarray(v) for k, v in
             reconstruction_metrics(jnp.asarray(x), jnp.asarray(x + noise)).items()}
    res = -noise
    vaf_ref = np.clip(1 - res.var(axis=-1) / x.var(axis=-1), 0, 1)
    np.testing.assert_allclose(m["vaf"], vaf_ref, atol=1e-5)
    np.testing.assert_allclose(m["mse"], (noise ** 2).mean(axis=-1), atol=1e-6)
    snr_ref = 10 * np.log10((x ** 2).mean(-1) / (noise ** 2).mean(-1))
    np.testing.assert_allclose(m["snr_db"], snr_ref, atol=1e-3)


def test_perfect_reconstruction_limits(rng):
    x = rng.standard_normal((2, 64)).astype(np.float32)
    with jax.default_device(CPU):
        m = reconstruction_metrics(jnp.asarray(x), jnp.asarray(x))
    assert np.allclose(np.asarray(m["vaf"]), 1.0)
    assert np.all(np.asarray(m["snr_db"]) == 100.0)  # capped


def test_calculate_vaf_percent():
    y = np.array([1.0, 2.0, 3.0, 4.0])
    assert calculate_vaf(y, y) == 100.0


def test_gaussian_log_likelihood():
    # standard normal at its mean: ll = -0.5 log(2 pi)
    val = gaussian_log_likelihood(np.zeros(10), np.zeros(10), np.zeros(10))
    np.testing.assert_allclose(val, -0.5 * np.log(2 * np.pi), rtol=1e-6)


def test_interpolate_latent_endpoints(rng):
    z1 = rng.standard_normal((5, 3))
    z2 = rng.standard_normal((5, 3))
    path = interpolate_latent(z1, z2, n_steps=7)
    assert path.shape == (7, 5, 3)
    np.testing.assert_allclose(path[0], z1)
    np.testing.assert_allclose(path[-1], z2)


def test_gaussian_mi_detects_dependence(rng):
    n, t, c = 300, 4, 2
    x = rng.standard_normal((n, t, c))
    y_dep = 0.9 * x + 0.1 * rng.standard_normal((n, t, c))
    y_ind = rng.standard_normal((n, t, c))
    mi_dep = gaussian_mutual_information(x, y_dep)
    mi_ind = gaussian_mutual_information(x, y_ind)
    assert mi_dep > mi_ind + 1.0


def test_histogram_mi_matrix(rng):
    x = rng.standard_normal((50, 20, 3))
    z = np.concatenate([x[:, :, :1], rng.standard_normal((50, 20, 1))], axis=2)
    mi = histogram_mutual_information(x, z, bins=8)
    assert mi.shape == (3, 2)
    assert mi[0, 0] > mi[1, 1]  # channel 0 copied into z -> high MI


def test_gaussian_mi_matches_reference_estimator():
    """gaussian_mutual_information is NOT a substitution: the reference's
    compute_mutual_information (utils/metrics_utils.py:8-82) is itself the
    PCA + covariance-log-det Gaussian estimator, and ours must agree with it
    exactly (same eps regularization, same full-SVD PCA), with and without
    dimensionality reduction. Compared against a golden fixture generated
    once by tests/make_golden.py:golden_mi — the untrusted reference tree is
    never executed at test time."""
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "mi_gaussian.npz")
    g = np.load(path)
    x, y = g["x"], g["y"]
    for reduce_dim in (False, True):
        theirs = float(g[f"mi_reduce{int(reduce_dim)}"])
        ours = gaussian_mutual_information(
            x, y, reduce_dim=reduce_dim, n_components_X=10, n_components_Y=5)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12), reduce_dim


# ---------------------------------------------------------------------------
# analyses on a real (small) model + dataset
# ---------------------------------------------------------------------------

def test_latent_interpolation_analysis(eval_setup, tmp_path):
    """Latent interpolation endpoints decode to the endpoints' own
    reconstructions; plots + GIF land on disk (reference
    utils/data_utils.py:845-925)."""
    evaluator, trimmed, _, _ = eval_setup
    prefix = str(tmp_path / "interp")
    gif = str(tmp_path / "interp.gif")
    with jax.default_device(CPU):
        res = evaluator.latent_interpolation(trimmed[0], trimmed[1], steps=3,
                                             plot_prefix=prefix,
                                             animate_path=gif)
        # endpoint latents = the samples' own posterior means (computed on
        # the same device: TPU/CPU fp32 matmul rounding differs)
        a = evaluator.analyze_sample(trimmed[0]["fhr_st"][None],
                                     trimmed[0]["fhr_ph"][None],
                                     trimmed[0]["fhr_up_ph"][None])
    k, s, d = res["z_path"].shape
    assert k == 3
    assert res["linear_output"].shape[:2] == (3, s)
    np.testing.assert_allclose(res["z_path"][0], a["outputs"]["z"][0],
                               atol=1e-5)
    assert os.path.exists(prefix + "_z_latent.png")
    assert os.path.exists(prefix + "_decoder.png")
    assert os.path.exists(gif)


def test_classification_epoch_sweep(tmp_path, rng):
    from vae_teb_tpu.eval import classification_epoch_sweep
    n = 200
    epochs = np.repeat([0.0, 3600.0, 7200.0, -1200.0], n // 4)
    labels = (rng.random(n) < 0.5).astype(int)
    # separable scores: prob tracks the label with mild noise
    probs = np.clip(labels * 0.8 + 0.1 + 0.05 * rng.standard_normal(n),
                    0, 1)
    preds = (probs >= 0.5).astype(int)
    out_dir = str(tmp_path / "sweep")
    res = classification_epoch_sweep(
        {"epoch_num": epochs, "prob_class_1": probs,
         "predicted_class": preds, "true_label": labels},
        out_dir, exclude_epochs=(-1200.0,))
    assert res["overall"]["auc"] > 0.95
    assert len(res["by_epoch"]) == 3  # -1200 excluded
    assert set(res["by_epoch"]["epoch_num"]) == {0.0, 3600.0, 7200.0}
    np.testing.assert_allclose(res["by_epoch"]["epoch_hours"],
                               [0.0, 1.0, 2.0])
    for f in ("overall_roc.png", "overall_metrics.txt",
              "group_metrics_by_epoch.csv", "auc_vs_epoch.png",
              "accuracy_vs_epoch.png"):
        assert os.path.exists(os.path.join(out_dir, f)), f


def test_coefficient_error_stats_oracle(rng):
    from vae_teb_tpu.eval import coefficient_error_stats
    sx = rng.standard_normal((3, 5, 40)).astype(np.float32)
    with jax.default_device(CPU):
        stats = coefficient_error_stats(sx, sx, np.ones_like(sx))
    np.testing.assert_allclose(np.asarray(stats["mse"]), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(stats["vaf"]), 1.0, atol=1e-6)
    assert np.all(np.asarray(stats["snr_db"]) > 60.0)
    # unit predicted variance, zero error: ll = -0.5 log(2 pi)
    np.testing.assert_allclose(np.asarray(stats["log_likelihood"]),
                               -0.5 * np.log(2 * np.pi), atol=1e-5)
    # known noise level: SNR ~= 10 log10(E/sigma^2)
    sigma = 0.1
    noisy = sx + sigma * rng.standard_normal(sx.shape).astype(np.float32)
    with jax.default_device(CPU):
        stats2 = coefficient_error_stats(sx, noisy)
    expected = 10 * np.log10((sx ** 2).mean() / sigma ** 2)
    assert abs(np.asarray(stats2["snr_db"]).mean() - expected) < 2.0
    # NONZERO-error VAF oracle (regression for the squared-residual bug):
    # residual = sigma*noise, so VAF = 1 - var(res)/var(sx) ~= 1 - sigma^2
    # for unit-variance sx. The old err^2-based formula gives ~1 - 2e-4.
    vaf2 = np.asarray(stats2["vaf"])
    per_ch_sig = sx.transpose(1, 0, 2).reshape(sx.shape[1], -1).var(axis=1)
    per_ch_res = (noisy - sx).transpose(1, 0, 2).reshape(
        sx.shape[1], -1).var(axis=1)
    np.testing.assert_allclose(vaf2, 1.0 - per_ch_res / (per_ch_sig + 1e-12),
                               atol=1e-5)
    assert np.all(vaf2 < 1.0 - 0.5 * sigma ** 2)


def test_seqvae_mse_test_and_prediction_accuracy(tmp_path, rng):
    """Oracle stubs: a model whose linear_output IS the target must score
    zero MSE; a predict-st model whose windows hold the exact future
    coefficients must score zero chained-prediction MSE (semantics of
    reference seqvae_mse_test / seqvae_prediction_accuracy_test,
    predict_st graph_model.py:948,1115)."""
    import types
    from vae_teb_tpu.eval import prediction_accuracy_test, seqvae_mse_test
    b, s, c_st, c_ph, h, p_idx = 2, 12, 4, 3, 3, 3
    y_st = rng.standard_normal((b, s, c_st)).astype(np.float32)
    y_ph = rng.standard_normal((b, s, c_ph)).astype(np.float32)
    batch = {"fhr_st": y_st, "fhr_ph": y_ph,
             "fhr_up_ph": np.zeros((b, s, 5), np.float32)}

    recon = types.SimpleNamespace(apply=lambda *a, **k: {
        "linear_output": jnp.concatenate([jnp.asarray(y_st),
                                          jnp.asarray(y_ph)], axis=-1)})
    with jax.default_device(CPU):
        res = seqvae_mse_test(recon, {}, [batch], trim=2,
                              out_dir=str(tmp_path / "mse"))
    assert res["mse"].shape == (b, c_st + c_ph)
    np.testing.assert_allclose(res["mse"], 0.0, atol=1e-12)
    np.testing.assert_allclose(res["vaf"], 1.0, atol=1e-6)
    assert os.path.exists(str(tmp_path / "mse" / "error_stats-mse.npy"))

    # exact future windows: mu[:, t, j, c] = target[:, t+1+j, c]
    def windows_of(target):
        w = np.zeros((b, s, h, target.shape[-1]), np.float32)
        for t in range(s - h):
            w[:, t] = target[:, t + 1:t + 1 + h]
        return jnp.asarray(w)

    pred = types.SimpleNamespace(apply=lambda *a, **k: {
        "scattering_mu": windows_of(y_st),
        "scattering_logvar": jnp.zeros((b, s, h, c_st)),
        "phase_harmonic_mu": windows_of(y_ph),
        "phase_harmonic_logvar": jnp.zeros((b, s, h, c_ph))})
    with jax.default_device(CPU):
        res2 = prediction_accuracy_test(pred, {}, [batch],
                                        prediction_idx=p_idx,
                                        out_dir=str(tmp_path / "pred"))
    np.testing.assert_allclose(res2["scattering_mse"], 0.0, atol=1e-12)
    np.testing.assert_allclose(res2["phase_mse"], 0.0, atol=1e-12)
    assert res2["scattering_vaf"].shape == (c_st,)
    np.testing.assert_allclose(res2["scattering_vaf"], 1.0, atol=1e-6)
    # zero logvar + zero error: ll = -0.5 log(2 pi)
    np.testing.assert_allclose(res2["scattering_log_likelihood"],
                               -0.5 * np.log(2 * np.pi), atol=1e-5)

    # a trim that would leave an empty interior must raise, not emit NaNs
    # (reference prediction_accuracy_test has the analogous length check)
    with pytest.raises(ValueError, match="too short"):
        seqvae_mse_test(recon, {}, [batch], trim=s // 2)


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("evalds")
    path = str(d / "eval.h5")
    sc = PhaseScattering1D(J=6, Q=2, T=8, shape=1024, max_order=1)
    build_dataset(path, n_records=4, windows_per_record=2, len_signal=1024,
                  seed=3, transform=sc)
    trim_minutes = 0.5  # 120 raw samples, 15 decimated (dec=8)
    calc = DatasetStatsCalculator(trim_minutes=trim_minutes, decimation=8)
    stats = calc.calculate_stats([path])
    stats_path = str(d / "stats.h5")
    calc.save_stats(stats, stats_path)

    n_st = sc.scattering.output_channels
    sel = sc.optimal_fhr_selection()
    n_ph = sel["phase_selection"]["n_selected"]
    n_cross = sel["cross_selection"]["n_selected"]
    trim_dec = 15
    seq = sc.scattering.n_out - 2 * trim_dec
    dec = 1024 // sc.scattering.n_out

    model = SeqVaeTeb(n_scattering=n_st, n_phase=n_ph,
                      input_channels=n_cross, decimation_factor=dec)
    with jax.default_device(jax.devices("cpu")[0]):
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng, "sample": rng},
            jnp.zeros((1, seq, n_st)), jnp.zeros((1, seq, n_ph)),
            jnp.zeros((1, seq, n_cross)), train=False)

    trimmed = CombinedHDF5Dataset(path, stats_path=stats_path,
                                  trim_minutes=trim_minutes, decimation=8,
                                  cache_size=0)
    raw = CombinedHDF5Dataset(
        path, stats_path=stats_path, cache_size=0,
        normalize_fields=("fhr_st", "fhr_ph", "fhr_up_ph"),
        allow_stats_trim_mismatch=True)
    evaluator = ModelEvaluator(
        model, variables, scattering=sc, stats=stats,
        cross_subset=sel["cross_selection"]["selected_indices"],
        trim_decimated=trim_dec)
    return evaluator, trimmed, raw, sc


def test_reconstruction_analysis(eval_setup):
    evaluator, trimmed, _, _ = eval_setup
    with jax.default_device(CPU):
        batches = trimmed.as_batches(batch_size=2, shuffle=False,
                                     drop_last=False)
        out = evaluator.reconstruction_analysis(batches)
    n = len(trimmed)
    assert out["vaf"].shape == (n,)
    assert np.all(np.isfinite(out["mse"]))
    assert np.all(out["kld"] >= -1e-5)


def test_up_ablation(eval_setup):
    evaluator, trimmed, _, _ = eval_setup
    with jax.default_device(CPU):
        res = evaluator.up_ablation(
            trimmed.as_batches(batch_size=2, shuffle=False, drop_last=False))
    assert len(res["te_with_up"]) == len(trimmed)
    # zeroed source at init: TE must change (encoders see different input)
    assert not np.allclose(res["te_with_up"], res["te_without_up"])


def test_te_shift_analysis(eval_setup):
    evaluator, _, raw, _ = eval_setup
    s = raw[0]
    with jax.default_device(CPU):
        res = evaluator.te_shift_analysis(s["fhr"], s["up"], s["fhr_st"],
                                          s["fhr_ph"],
                                          shift_seconds=[-8, -4, 0])
    assert res["te"].shape == (3,)
    assert np.all(np.isfinite(res["te"]))
    assert np.all(res["te"] >= -1e-5)


def test_up_gain_sweep(eval_setup):
    evaluator, _, raw, _ = eval_setup
    s = raw[0]
    with jax.default_device(CPU):
        res = evaluator.up_gain_sweep(s["fhr"], s["up"], s["fhr_st"],
                                      s["fhr_ph"], gains=(0.0, 1.0, 2.0))
    assert res["te"].shape == (3,)
    assert np.all(np.isfinite(res["te"]))


def test_full_suite_artifacts(eval_setup, tmp_path):
    evaluator, trimmed, raw, _ = eval_setup
    out_dir = str(tmp_path / "suite")
    with jax.default_device(CPU):
        results = run_evaluation_suite(
            evaluator, trimmed, out_dir, raw_dataset=raw, num_samples=4,
            batch_size=2, shift_samples=1, shift_seconds=[-4, 0],
            gains=(0.0, 1.0))
    assert os.path.exists(os.path.join(out_dir, "metrics.pkl"))
    assert os.path.exists(os.path.join(out_dir, "metrics_histograms.png"))
    assert os.path.exists(os.path.join(out_dir, "up_ablation.png"))
    assert os.path.exists(os.path.join(out_dir, "te_gain_sweep.png"))
    assert "te_shift" in results and "gain_sweep" in results
    assert any(f.startswith("analysis_") for f in os.listdir(out_dir))
    assert results["errors"] == []  # clean data -> no isolated failures
    # the scattering-domain acceptance battery ran on the same samples
    acc = results["coefficient_acceptance"]
    n_coeff = trimmed[0]["fhr_st"].shape[-1] + trimmed[0]["fhr_ph"].shape[-1]
    assert acc["mse"].shape[1] == n_coeff  # per (sample, channel)
    assert np.all(np.isfinite(acc["vaf"]))
    assert os.path.exists(os.path.join(
        out_dir, "coefficient_error_stats-mse.npy"))


def test_suite_isolates_per_sample_failures(eval_setup, tmp_path, monkeypatch):
    """One degenerate sample must not kill the run: the failing stage is
    recorded in results['errors'] and every other analysis still lands
    (reference per-sample try/except, graph_model.py:1203-1205,1439-1441)."""
    evaluator, trimmed, raw, _ = eval_setup
    out_dir = str(tmp_path / "suite_faulty")
    calls = {"n": 0}
    orig = type(evaluator).te_shift_analysis

    def flaky(self, *a, **k):
        calls["n"] += 1
        raise RuntimeError("degenerate sample")

    monkeypatch.setattr(type(evaluator), "te_shift_analysis", flaky)
    with jax.default_device(CPU):
        results = run_evaluation_suite(
            evaluator, trimmed, out_dir, raw_dataset=raw, num_samples=4,
            batch_size=2, shift_samples=2, shift_seconds=[-4, 0],
            gains=(0.0, 1.0))
    monkeypatch.setattr(type(evaluator), "te_shift_analysis", orig)
    assert calls["n"] >= 1
    assert all(e["stage"] == "te_shift" for e in results["errors"])
    assert len(results["errors"]) == calls["n"]
    # the rest of the suite completed despite the failures
    assert os.path.exists(os.path.join(out_dir, "metrics.pkl"))
    assert "gain_sweep" in results and "te_shift" not in results
