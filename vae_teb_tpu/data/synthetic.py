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


def _reflect_pad_tail(x: np.ndarray, pad: int) -> np.ndarray:
    """Right-pad by (chained) reflection — mirrors the adaptor's
    do_pad/do_reflect tail handling for records whose length is not a
    multiple of the window stride. Chained so pad may exceed len(x)-1."""
    while pad > 0:
        p = min(pad, len(x) - 1)
        x = np.concatenate([x, x[-1 - p:-1][::-1]])
        pad -= p
    return x


def window_record(fhr: np.ndarray, up: np.ndarray,
                  window: int = 5760, overlap: float = 0.5,
                  weight: Optional[np.ndarray] = None,
                  decimation: int = 16
                  ) -> Dict[str, np.ndarray]:
    """Block one arbitrary-length record into overlapping fixed windows.

    This is the record->windows ingest contract of the reference's ETL
    (/root/reference/hdf5_dataset/create_hdf5_dataset.py:352-403: the
    external adaptor's prepare_data with align_left, 0.5
    overlap_percentage, reflect tail padding): windows of `window` samples
    at stride window*(1-overlap), aligned left at offset 0, with the tail
    reflect-padded so the final window is full-length.

    weight: optional per-raw-sample validity in [0,1] (length == record);
    windowed alongside and decimated (block mean) to window//decimation —
    the schema's per-sequence-step sample weight. Defaults to ones.

    Returns {"fhr": (n, window), "up": (n, window),
             "weight": (n, window//decimation), "domain_start": (n,)}.
    """
    if fhr.shape != up.shape or fhr.ndim != 1:
        raise ValueError("fhr/up must be equal-length 1-D records")
    if not 0.0 <= overlap < 1.0:
        raise ValueError("overlap must be in [0, 1)")
    L = len(fhr)
    if L < 2:
        raise ValueError("record too short to window")
    stride = max(1, int(round(window * (1.0 - overlap))))
    n = 1 if L <= window else int(np.ceil((L - window) / stride)) + 1
    padded_len = (n - 1) * stride + window
    w_raw = np.ones(L, np.float32) if weight is None else \
        np.asarray(weight, np.float32)
    if len(w_raw) != L:
        raise ValueError("weight must be raw-resolution (len == record)")
    pad = padded_len - L
    fhr_p = _reflect_pad_tail(np.asarray(fhr, np.float32), pad)
    up_p = _reflect_pad_tail(np.asarray(up, np.float32), pad)
    # reflected (synthesized) samples carry zero weight: they are not data
    w_p = np.concatenate([w_raw, np.zeros(pad, np.float32)])
    starts = np.arange(n) * stride
    idx = starts[:, None] + np.arange(window)[None, :]
    len_seq = window // decimation
    w_win = w_p[idx].reshape(n, len_seq, decimation).mean(axis=2)
    return {"fhr": fhr_p[idx], "up": up_p[idx],
            "weight": w_win.astype(np.float32),
            "domain_start": starts.astype(np.float32)}


def build_dataset_from_records(path: str,
                               records,
                               transform: Optional[PhaseScattering1D] = None,
                               J: int = 11, Q: int = 4, T: int = 16,
                               window: int = 5760,
                               overlap: float = 0.5,
                               batch_size: int = 4,
                               pre_defined_target: float = 1.0,
                               min_weight: float = 0.90) -> Dict:
    """Generic record-list ETL: arbitrary-length records -> overlapping
    windows -> on-device scattering (masked inside the computation) -> QC ->
    HDF5 append. The framework's equivalent of
    create_hdf5_dataset_from_records_list
    (/root/reference/hdf5_dataset/create_hdf5_dataset.py:352-508), with the
    external .mat adaptor replaced by an explicit ingest contract:

    records: iterable of dicts with keys
        fhr (L,), up (L,)           raw 4 Hz traces, any equal length L
        weight (L,) optional        per-sample validity, default ones
        guid str optional           record id, default "record_<i>"
        cs_label / bg_label bool    optional, default False

    Per-record failures are caught and reported in the returned errors list
    (reference :505-508); epoch stores each window's domain start offset
    (reference :501).
    """
    sc = transform or PhaseScattering1D(J=J, Q=Q, T=T, shape=window,
                                        max_order=1)
    if sc.scattering.N != window:
        raise ValueError(f"transform shape {sc.scattering.N} != window "
                         f"{window}")
    sel = sc.optimal_fhr_selection()
    phase_idx = sel["phase_selection"]["selected_indices"]
    cross_idx = sel["cross_selection"]["selected_indices"]
    len_seq = sc.scattering.n_out
    dec = window // len_seq

    create_initial_hdf5(path, len_signal=window, len_sequence=len_seq,
                        channel_counts={"fhr_st": sc.scattering.output_channels,
                                        "fhr_ph": len(phase_idx),
                                        "fhr_up_ph": len(cross_idx)})

    kept = skipped = 0
    errors = []
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

    for rec_i, rec in enumerate(records):
        guid = rec.get("guid", f"record_{rec_i:04d}")
        try:
            win = window_record(np.asarray(rec["fhr"]), np.asarray(rec["up"]),
                                window=window, overlap=overlap,
                                weight=rec.get("weight"), decimation=dec)
            fhr_w, up_w, wt_w = win["fhr"], win["up"], win["weight"]
            for start in range(0, len(fhr_w), batch_size):
                sl = slice(start, start + batch_size)
                fb, ub, wb = fhr_w[sl], up_w[sl], wt_w[sl]
                x2 = jnp.asarray(np.stack([fb, ub], axis=1))
                out_ph = sc(jnp.asarray(fb), compute_phase=True,
                            phase_subset=phase_idx)
                out_cr = sc(x2, compute_phase=False, compute_cross_phase=True,
                            cross_subset=cross_idx, compute_scattering=False)
                st = np.asarray(out_ph["scattering"])
                ph = np.asarray(out_ph["phase_corr"])
                cr = np.asarray(out_cr["cross_phase_corr"])
                for i in range(fb.shape[0]):
                    if not passes_qc(fb[i], ub[i], wb[i],
                                     min_weight=min_weight,
                                     flat_tolerance=1e-9):
                        skipped += 1
                        continue
                    pending["fhr"].append(fb[i])
                    pending["up"].append(ub[i])
                    pending["fhr_st"].append(st[i])
                    pending["fhr_ph"].append(ph[i])
                    pending["fhr_up_ph"].append(cr[i])
                    pending["target"].append(pre_defined_target * wb[i])
                    pending["weight"].append(wb[i])
                    pending["epoch"].append(
                        win["domain_start"][start + i])
                    pending["cs_label"].append(bool(rec.get("cs_label",
                                                            False)))
                    pending["bg_label"].append(bool(rec.get("bg_label",
                                                            False)))
                    pending["guid"].append(str(guid))
                    kept += 1
            flush()
        except Exception as e:  # per-record isolation (reference :505-508)
            errors.append({"record": str(guid), "error": repr(e)})
    return {"kept": kept, "skipped": skipped, "errors": errors}


def synthetic_records(n_records: int, record_len: int,
                      seed: int = 0):
    """Yield synthetic long records in the build_dataset_from_records
    ingest format (the stand-in for the reference's clinical .mat reader)."""
    rng = np.random.default_rng(seed)
    for i in range(n_records):
        fhr, up = synthetic_fhr_up(record_len, rng, 1)
        yield {"fhr": fhr[0], "up": up[0], "guid": f"synthetic_{i:04d}"}


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
