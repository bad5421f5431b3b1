"""Auxiliary subsystems: frequency analysis, CV splits, logging, profiling,
CLI plumbing."""

import logging
import os

import numpy as np
import pytest

from vae_teb_tpu.data.splits import create_cv_splits, guid_label_splits
from vae_teb_tpu.ops.frequency_analysis import (analyze_scattering_frequencies,
                                                channel_labels,
                                                classify_harmonic_relationship,
                                                physiological_band,
                                                print_detailed_analysis)
from vae_teb_tpu.utils import (StepTimer, StreamToLogger, device_memory_stats,
                               get_logger, setup_logging)


# -- frequency analysis ------------------------------------------------------

def test_frequency_analysis_prod_counts():
    a = analyze_scattering_frequencies(11, 4, 16, sampling_rate=4.0)
    assert a["counts"]["order1"] == 42
    assert a["counts"]["phase_pairs"] == 903
    assert a["counts"]["auto_pairs"] == 42
    assert a["config"]["num_samples"] == 5760
    # center freqs decrease and live below nyquist
    freqs = [f["center_freq_hz"] for f in a["first_order"]]
    assert all(a >= b for a, b in zip(freqs, freqs[1:]))
    assert max(freqs) < 2.0  # nyquist at 4 Hz


def test_frequency_bands():
    assert "ULF" in physiological_band(0.05)
    assert "VLF" in physiological_band(0.3)
    assert "(LF)" in physiological_band(0.7)
    assert "(HF)" in physiological_band(1.5)
    assert "VHF" in physiological_band(3.0)


def test_harmonic_classification():
    assert classify_harmonic_relationship(1.0) == "Auto-correlation (1:1)"
    assert classify_harmonic_relationship(2.05) == "Octave (1:2)"
    assert classify_harmonic_relationship(1.5) == "Perfect Fifth (2:3)"
    assert classify_harmonic_relationship(10.0) == "High harmonic ratio"


def test_channel_labels_order1():
    a = analyze_scattering_frequencies(6, 2, 8)
    labels = channel_labels(a, max_order=1)
    assert labels[0].startswith("order0")
    assert len(labels) == 1 + a["counts"]["order1"]
    labels2 = channel_labels(a, max_order=2)
    assert len(labels2) == 1 + a["counts"]["order1"] + a["counts"]["order2"]


def test_print_detailed_analysis_runs(capsys):
    a = analyze_scattering_frequencies(6, 2, 8)
    text = print_detailed_analysis(a)
    assert "low-pass" in text and "counts" in text


# -- CV splits ----------------------------------------------------------------

def test_cv_splits_partition():
    data = {"g0": [f"a{i}" for i in range(23)],
            "g1": [f"b{i}" for i in range(11)]}
    folds = create_cv_splits(data, n_splits=5, val_ratio=0.1, random_state=0)
    assert len(folds) == 5
    for name, fold in folds.items():
        for group, items in data.items():
            tr = set(fold["train"][group])
            va = set(fold["val"][group])
            te = set(fold["test"][group])
            assert tr | va | te == set(items)  # partition covers everything
            assert not (tr & va or tr & te or va & te)  # disjoint
    # test folds across splits tile the whole group
    all_test = set()
    for fold in folds.values():
        all_test |= set(fold["test"]["g0"])
    assert all_test == set(data["g0"])


def test_cv_splits_deterministic():
    data = {"g": [str(i) for i in range(30)]}
    a = create_cv_splits(data, n_splits=3, random_state=7)
    b = create_cv_splits(data, n_splits=3, random_state=7)
    assert a == b
    c = create_cv_splits(data, n_splits=3, random_state=8)
    assert a != c


def test_guid_label_splits():
    guids = [f"s{i}" for i in range(40)]
    labels = [i % 2 for i in range(40)]
    folds = guid_label_splits(guids, labels, n_splits=4)
    fold = folds["fold_1"]
    assert set(fold["test"].keys()) == {"class_0", "class_1"}
    # stratification: both classes appear in every test fold
    assert fold["test"]["class_0"] and fold["test"]["class_1"]


# -- logging / profiling -------------------------------------------------------

def test_setup_logging_writes_file(tmp_path):
    log_file = str(tmp_path / "t.log")
    log = setup_logging(log_file, capture_root=False)
    log.info("hello framework")
    for h in log.handlers:
        h.flush()
    assert "hello framework" in open(log_file).read()


def test_stream_to_logger(tmp_path):
    logger = logging.getLogger("test_stream")
    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    s = StreamToLogger(logger)
    s.write("line one\nline two\npartial")
    s.flush()
    assert records == ["line one", "line two", "partial"]


def test_step_timer_report(tmp_path):
    t = StepTimer()
    with t.section("alpha"):
        pass
    with t.section("alpha"):
        pass
    with t.section("beta"):
        pass
    rep = t.report()
    assert "alpha" in rep and "beta" in rep
    p = str(tmp_path / "prof.txt")
    t.save(p)
    assert os.path.exists(p)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1


# -- CLI plumbing ---------------------------------------------------------------

def test_layer_visualizers(tmp_path):
    """Heatmap for 2-D kernels, histogram for 1-D biases, RMS overview —
    observability parity with reference run_utils.py:106-176."""
    from vae_teb_tpu.utils import (list_layers, visualize_layer_parameters,
                                   visualize_weight_overview)
    params = {"enc": {"dense": {"kernel": np.random.randn(8, 4),
                                "bias": np.zeros(4)}},
              "dec": {"dense": {"kernel": np.random.randn(4, 8),
                                "bias": np.ones(8)}}}
    layers = list_layers(params)
    assert "enc/dense/kernel" in layers and len(layers) == 4
    p1 = str(tmp_path / "kernel.png")
    visualize_layer_parameters(params, "enc/dense/kernel", p1)
    assert os.path.exists(p1)
    p2 = str(tmp_path / "bias.png")
    visualize_layer_parameters(params, "dec/dense/bias", p2)  # suffix match
    assert os.path.exists(p2)
    with pytest.raises(ValueError):
        visualize_layer_parameters(params, "dense/kernel", p1)  # ambiguous
    with pytest.raises(ValueError):
        visualize_layer_parameters(params, "nope", p1)
    p3 = str(tmp_path / "overview.png")
    visualize_weight_overview(params, p3)
    assert os.path.exists(p3)


def test_cli_parser():
    from vae_teb_tpu.cli import main
    with pytest.raises(SystemExit):
        main([])  # no command
    with pytest.raises(SystemExit):
        main(["train"])  # missing --config
