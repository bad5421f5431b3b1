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


# ---------------------------------------------------------------------------
# analyses on a real (small) model + dataset
# ---------------------------------------------------------------------------

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
