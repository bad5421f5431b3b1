"""Synthetic FHR/UP signal generation + dataset ETL.

The reference's ingest edge reads clinical .mat files through an external
`early_maestra` adaptor that is not in its repo, and its bundled HDF5 is a
missing blob (/root/reference/.MISSING_LARGE_BLOBS:1) — so a synthetic
generator is the framework's reproducible ingest path for tests and
benchmarks. Signals are physiologically shaped (FHR baseline ~110-160 bpm
with LF/MF variability and contraction-coupled decelerations; UP with
2-5 contractions / 10 min), exercising exactly the frequency bands the
coefficient selection targets.

`build_dataset` is the TPU ETL: windows -> on-device scattering + selected
phase/cross coefficients (batched) -> QC -> HDF5 append. Replaces the
reference's per-record GPU loop
(/root/reference/hdf5_dataset/create_hdf5_dataset.py:352-508).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import PhaseScattering1D
from .schema import append_batch, create_initial_hdf5

SAMPLE_RATE_HZ = 4.0


def synthetic_fhr_up(n_samples: int, rng: np.random.Generator,
                     n_windows: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Generate (n_windows, n_samples) FHR and UP traces at 4 Hz."""
    t = np.arange(n_samples) / SAMPLE_RATE_HZ
    fhrs, ups = [], []
    for _ in range(n_windows):
        baseline = rng.uniform(120.0, 150.0)
        # uterine activity: 2-5 contractions per 10 min
        n_contr = rng.integers(2, 6)
        up = rng.uniform(5.0, 12.0) + 2.0 * rng.standard_normal(n_samples)
        duration = n_samples / SAMPLE_RATE_HZ
        centers = rng.uniform(0, duration, n_contr)
        widths = rng.uniform(30.0, 70.0, n_contr)
        amps = rng.uniform(30.0, 70.0, n_contr)
        contraction = np.zeros(n_samples)
        for c, w, a in zip(centers, widths, amps):
            contraction += a * np.exp(-0.5 * ((t - c) / w) ** 2)
        up = up + contraction
        # FHR: baseline + LF/MF variability + contraction-coupled decels
        fhr = np.full(n_samples, baseline)
        for f_lo, f_hi, amp in [(0.04, 0.15, 6.0), (0.15, 0.5, 3.0)]:
            n_comp = 4
            freqs = rng.uniform(f_lo, f_hi, n_comp)
            phases = rng.uniform(0, 2 * np.pi, n_comp)
            amps_v = rng.uniform(0.3, 1.0, n_comp) * amp
            for fq, ph, a in zip(freqs, phases, amps_v):
                fhr += a * np.sin(2 * np.pi * fq * t + ph)
        # late decelerations lagging contractions by ~20 s
        lag = rng.uniform(10.0, 30.0)
        decel_gain = rng.uniform(0.1, 0.5)
        for c, w, a in zip(centers, widths, amps):
            fhr -= decel_gain * a * np.exp(-0.5 * ((t - c - lag) / w) ** 2)
        fhr += 1.5 * rng.standard_normal(n_samples)
        fhrs.append(fhr.astype(np.float32))
        ups.append(np.clip(up, 0, None).astype(np.float32))
    return np.stack(fhrs), np.stack(ups)


def find_flat_regions(signal: np.ndarray, tolerance: float = 1e-3,
                      min_length: int = 20) -> List[Tuple[int, int]]:
    """Runs of consecutive samples whose successive differences stay within
    tolerance, at least min_length long (reference create_hdf5_dataset.py:46-81).
    Vectorized run-length pass instead of the reference's Python sample loop."""
    if len(signal) < 2:
        return []
    flat = np.abs(np.diff(signal)) <= tolerance
    edges = np.diff(flat.astype(np.int8))
    starts = list(np.where(edges == 1)[0] + 1)
    ends = list(np.where(edges == -1)[0] + 1)
    if flat[0]:
        starts = [0] + starts
    if flat[-1]:
        ends = ends + [len(flat)]
    out = []
    for s, e in zip(starts, ends):
        # run of flat diffs [s, e) covers samples [s, e] inclusive
        if (e - s + 1) >= min_length:
            out.append((s, e))
    return out


def passes_qc(fhr: np.ndarray, up: np.ndarray, weight: np.ndarray,
              min_weight: float = 0.90, flat_tolerance: float = 1e-9
              ) -> bool:
    """Window quality control identical to the reference's ETL filter
    (create_hdf5_dataset.py:459-478)."""
    if float(np.mean(weight)) < min_weight:
        return False
    fhr_flats = find_flat_regions(fhr, tolerance=flat_tolerance)
    up_flats = find_flat_regions(up, tolerance=flat_tolerance)
    fhr_lens = [e - s + 1 for s, e in fhr_flats]
    up_lens = [e - s + 1 for s, e in up_flats]
    if max(fhr_lens, default=0) > 480 or max(up_lens, default=0) > 1200:
        return False
    if sum(fhr_lens) > 1200 or sum(up_lens) > 1200:
        return False
    return True


def build_dataset(path: str,
                  n_records: int = 8,
                  windows_per_record: int = 2,
                  len_signal: int = 5760,
                  seed: int = 0,
                  transform: Optional[PhaseScattering1D] = None,
                  J: int = 11, Q: int = 4, T: int = 16,
                  batch_size: int = 4,
                  pre_defined_target: float = 1.0,
                  cs_label: bool = False,
                  bg_label: bool = False) -> Dict[str, int]:
    """Create a schema-complete HDF5 dataset from synthetic records.

    The transform runs on device with the selection masks applied *inside*
    the computation (only the 44/130 selected pairs are ever computed),
    unlike the reference which computes all 903 pairs per window and masks
    on the host.
    """
    rng = np.random.default_rng(seed)
    sc = transform or PhaseScattering1D(J=J, Q=Q, T=T, shape=len_signal,
                                        max_order=1)
    sel = sc.optimal_fhr_selection()
    phase_idx = sel["phase_selection"]["selected_indices"]
    cross_idx = sel["cross_selection"]["selected_indices"]
    len_seq = sc.scattering.n_out

    create_initial_hdf5(path, len_signal=len_signal, len_sequence=len_seq,
                        channel_counts={"fhr_st": sc.scattering.output_channels,
                                        "fhr_ph": len(phase_idx),
                                        "fhr_up_ph": len(cross_idx)})

    kept = 0
    skipped = 0
    pending: Dict[str, list] = {k: [] for k in
                                ("fhr", "up", "fhr_st", "fhr_ph", "fhr_up_ph",
                                 "target", "weight", "epoch", "cs_label",
                                 "bg_label", "guid")}

    def flush():
        nonlocal pending
        if pending["fhr"]:
            append_batch(path, {k: (v if k == "guid" else np.stack(v))
                                for k, v in pending.items()})
            pending = {k: [] for k in pending}

    for rec in range(n_records):
        fhr, up = synthetic_fhr_up(len_signal, rng, windows_per_record)
        weight = np.ones((windows_per_record, len_seq), np.float32)
        for start in range(0, windows_per_record, batch_size):
            sl = slice(start, min(start + batch_size, windows_per_record))
            fb, ub = fhr[sl], up[sl]
            # channel 0 = FHR (scattering + acceleration source),
            # channel 1 = UP — matching the reference ETL's stacking
            # (create_hdf5_dataset.py:420, 433-437).
            x2 = jnp.asarray(np.stack([fb, ub], axis=1))
            out_ph = sc(jnp.asarray(fb), compute_phase=True,
                        phase_subset=phase_idx)
            out_cr = sc(x2, compute_phase=False, compute_cross_phase=True,
                        cross_subset=cross_idx, compute_scattering=False)
            st = np.asarray(out_ph["scattering"])
            ph = np.asarray(out_ph["phase_corr"])
            cr = np.asarray(out_cr["cross_phase_corr"])
            for i in range(fb.shape[0]):
                w = weight[sl][i]
                if not passes_qc(fb[i], ub[i], w, flat_tolerance=1e-9):
                    skipped += 1
                    continue
                pending["fhr"].append(fb[i])
                pending["up"].append(ub[i])
                pending["fhr_st"].append(st[i])
                pending["fhr_ph"].append(ph[i])
                pending["fhr_up_ph"].append(cr[i])
                pending["target"].append(pre_defined_target * w)
                pending["weight"].append(w)
                pending["epoch"].append(np.float32(rec * 1000 + start + i))
                pending["cs_label"].append(cs_label)
                pending["bg_label"].append(bg_label)
                pending["guid"].append(f"synthetic_{rec:04d}")
                kept += 1
        flush()
    return {"kept": kept, "skipped": skipped}
