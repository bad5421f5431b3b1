"""Full evaluation orchestrator — the `run_tests` equivalent.

Mirrors the reference's test battery entry point
(/root/reference/model/graph_model.py:910-985): GUID preselection, the
per-sample analysis plots, metric histograms, UP ablation, TE-vs-shift, and
the UP gain sweep, writing figures + pickles into an output directory.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from ..data.dataset import CombinedHDF5Dataset
from .analyses import (GAINS_DEFAULT, SHIFT_SECONDS_DEFAULT, ModelEvaluator)
from . import plots


def run_evaluation_suite(evaluator: ModelEvaluator,
                         dataset: CombinedHDF5Dataset,
                         out_dir: str,
                         raw_dataset: Optional[CombinedHDF5Dataset] = None,
                         num_samples: int = 50,
                         batch_size: int = 4,
                         shift_samples: int = 50,
                         shift_seconds: Sequence[int] = SHIFT_SECONDS_DEFAULT,
                         gains: Sequence[float] = GAINS_DEFAULT,
                         seed: int = 0,
                         run_shift_analysis: bool = True,
                         run_gain_sweep: bool = True,
                         plot_samples: Optional[int] = None,
                         recompute_chunk: int = 4) -> Dict:
    """Run every analysis and write artifacts under out_dir.

    `dataset`: trimmed + normalized, drives metrics/ablation/plots.
    `raw_dataset`: *untrimmed*, with normalized coefficient fields but raw
    (unnormalized) fhr/up — drives the shift/gain analyses, which recompute
    scattering from the raw traces and trim inside the device program
    (the reference uses the same two-dataset split, :1253-1276).

    Defaults match the reference's full battery — 50 preselected samples
    for the per-sample plots AND the shift/gain recompute analyses
    (graph_model.py:953-975,1210-1441; it runs them serially on the host,
    here each `recompute_chunk` of samples x all shifts is ONE device
    program, so the 50-sample battery costs ~13 device calls, not 3050
    host scattering recomputes). `plot_samples=None` plots every selected
    sample; `recompute_chunk` bounds device memory at
    chunk * len(shift_seconds) scattering windows per program.
    """
    os.makedirs(out_dir, exist_ok=True)
    results: Dict = {}
    # per-sample fault isolation: one degenerate sample must not kill a
    # 50-sample analysis run (reference wraps each sample in try/except and
    # keeps going, graph_model.py:1203-1205,1439-1441)
    errors: list = []

    def _guarded(stage: str, key, fn):
        try:
            return fn()
        except Exception as e:
            errors.append({"stage": stage, "sample": key, "error": repr(e)})
            return None

    # 1) deterministic GUID preselection (reference :953-975)
    rng = np.random.default_rng(seed)
    n = min(num_samples, len(dataset))
    sample_ids = rng.choice(len(dataset), size=n, replace=False)
    results["selected_indices"] = sample_ids

    def batches():
        # read_batch: batched hyperslab reads + batch-granular normalize,
        # ~7x the per-sample collate path (benchmarks/loader_bench.py) —
        # exactly where a 50-sample battery feels it
        for start in range(0, n, batch_size):
            yield dataset.read_batch(sample_ids[start:start + batch_size])

    # 2) metrics histograms + pickle (reference :1510-1680)
    metrics = evaluator.reconstruction_analysis(
        batches(), pickle_path=os.path.join(out_dir, "metrics.pkl"))
    plots.plot_metrics_histograms(
        metrics, os.path.join(out_dir, "metrics_histograms.png"))
    results["metrics"] = metrics

    # 3) per-sample analysis plots (reference :987-1208)
    def _analysis_plots(k: int):
        s = dataset[int(k)]
        analysis = evaluator.analyze_sample(s["fhr_st"][None],
                                            s["fhr_ph"][None],
                                            s["fhr_up_ph"][None])
        out = analysis["outputs"]
        guid = str(s.get("guid", k)).replace("/", "_")
        plots.plot_model_analysis(
            np.asarray(s["fhr"]), out["mu_pr"][0], analysis["te_map"][0],
            out["z"][0],
            os.path.join(out_dir, f"analysis_{guid}_{k}.png"),
            title=f"guid={guid}")
        plots.plot_vae_reconstruction(
            np.asarray(s["fhr"]), out["mu_pr"][0], out["logvar_pr"][0],
            os.path.join(out_dir, f"reconstruction_{guid}_{k}.png"),
            title=f"guid={guid}")

    n_plot = n if plot_samples is None else min(plot_samples, n)
    for k in sample_ids[:n_plot]:
        _guarded("analysis_plot", int(k), lambda k=k: _analysis_plots(k))

    # 4) UP ablation (reference :1682-1777)
    ablation = evaluator.up_ablation(batches())
    plots.plot_te_ablation_results(
        ablation, os.path.join(out_dir, "up_ablation.png"))
    results["ablation"] = ablation

    # 5/6) TE-vs-shift + UP gain sweep over the preselected samples,
    # chunk-batched on device (reference :1210-1441, :1779-1870)
    recompute = evaluator.scattering is not None and raw_dataset is not None
    if recompute:
        n_raw = len(raw_dataset)
        rc_ids = [int(k) for k in sample_ids[:shift_samples]
                  if int(k) < n_raw]
        chunks = [rc_ids[s:s + recompute_chunk]
                  for s in range(0, len(rc_ids), recompute_chunk)]

    if run_shift_analysis and recompute:
        shift_te, shift_ids = [], []
        for chunk in chunks:
            def _chunk_shift(chunk=chunk):
                b = raw_dataset.read_batch(chunk)
                return evaluator.te_shift_analysis(
                    b["fhr"], b["up"], b["fhr_st"], b["fhr_ph"],
                    shift_seconds=shift_seconds)["te"]        # (M, K)
            te = _guarded("te_shift", chunk, _chunk_shift)
            if te is not None:
                shift_te.append(te)
                shift_ids.extend(chunk)
        if shift_te:
            te_all = np.concatenate(shift_te, axis=0)
            for row, k in zip(te_all[:n_plot], shift_ids):
                plots.plot_transfer_entropy_vs_shift(
                    np.asarray(shift_seconds), row,
                    os.path.join(out_dir, f"te_shift_{k}.png"),
                    title=f"sample {k}")
            results["te_shift"] = {
                "shift_seconds": np.asarray(shift_seconds),
                "sample_indices": np.asarray(shift_ids),
                "te": te_all}

    if run_gain_sweep and recompute:
        gain_te, gain_ids = [], []
        for chunk in chunks:
            def _chunk_gain(chunk=chunk):
                b = raw_dataset.read_batch(chunk)
                return evaluator.up_gain_sweep(
                    b["fhr"], b["up"], b["fhr_st"], b["fhr_ph"],
                    gains=gains)["te"]                        # (M, K)
            te = _guarded("gain_sweep", chunk, _chunk_gain)
            if te is not None:
                gain_te.append(te)
                gain_ids.extend(chunk)
        if gain_te:
            te_all = np.concatenate(gain_te, axis=0)
            plots.plot_te_gain_sweep(
                np.asarray(gains), te_all,
                os.path.join(out_dir, "te_gain_sweep.png"))
            results["gain_sweep"] = {"gains": np.asarray(gains),
                                     "sample_indices": np.asarray(gain_ids),
                                     "te": te_all}

    # 7) scattering-domain acceptance battery (reference seqvae_mse_test,
    # predict_st graph_model.py:948-1113): coefficient-domain accuracy of
    # the decoder's linear_output on the same preselected samples
    def _coeff_battery():
        from .predict_st import seqvae_mse_test
        return seqvae_mse_test(evaluator.model, evaluator.variables,
                               batches(), out_dir=out_dir,
                               tag="coefficient_error_stats")

    stats = _guarded("coefficient_acceptance", None, _coeff_battery)
    if stats is not None:
        results["coefficient_acceptance"] = stats

    results["errors"] = errors
    return results
