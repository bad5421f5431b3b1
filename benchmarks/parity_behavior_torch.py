"""Behavioral probes of the TRAINED torch reference model: per-sample TE,
UP-ablation TE drop, and TE-vs-shift curve (coarse grid).

Usage: python parity_behavior_torch.py ckpt.pt data_dir out.json [n_te] [n_shift]

The shift probe mirrors the reference's run_transfer_entropy_shift_analysis
(/root/reference/model/graph_model.py:1210-1441): circularly shift the raw
UP trace, recompute the cross-phase scattering, normalize with the training
stats, trim, measure TE.
"""
import sys, json
import scipy.special as sp
if not hasattr(sp, 'sph_harm'): sp.sph_harm = sp.sph_harm_y
sys.path.insert(0, '/root/reference/kymatio')
sys.path.insert(0, '/root/reference/hdf5_dataset')
sys.path.insert(0, '/root/reference/model')
import numpy as np, torch
from hdf5_dataset import CombinedHDF5Dataset, normalize_tensor_data
from kymatio_phase_scattering import KymatioPhaseScattering1D
from vae_teb_model import SeqVaeTeb

ckpt, data_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
n_te = int(sys.argv[4]) if len(sys.argv) > 4 else 32
n_shift = int(sys.argv[5]) if len(sys.argv) > 5 else 2
SHIFTS_S = [-60, -45, -30, -15, 0]

model = SeqVaeTeb()
model.load_state_dict(torch.load(ckpt, map_location='cpu'))
model.eval()

ds = CombinedHDF5Dataset(f'{data_dir}/p.h5', stats_path=f'{data_dir}/ps.h5',
                         trim_minutes=2.0, cache_size=0, pin_memory=False)
raw = CombinedHDF5Dataset(f'{data_dir}/p.h5', stats_path=f'{data_dir}/ps.h5',
                          normalize_fields=['fhr_st', 'fhr_ph', 'fhr_up_ph'],
                          cache_size=0, pin_memory=False)

te, te_abl = [], []
with torch.no_grad():
    for i in range(min(n_te, len(ds))):
        s = ds[i]
        a = (s['fhr_st'][None], s['fhr_ph'][None], s['fhr_up_ph'][None])
        te.append(float(model.measure_transfer_entropy(*a, reduce_mean=True)))
        te_abl.append(float(model.measure_transfer_entropy(
            a[0], a[1], torch.zeros_like(a[2]), reduce_mean=True)))

# shift probe: recompute cross-phase on circularly shifted UP
sc = KymatioPhaseScattering1D(J=11, Q=4, T=16, shape=5760, device='cpu',
                              tukey_alpha=None, max_order=1)
sel = sc.get_optimal_coefficients_for_fhr(11, 4, 16)
cross_mask = sel['recommendations']['use_cross_mask']
stats = ds.stats if hasattr(ds, 'stats') else None
trim = 30
shift_curves = []
with torch.no_grad():
    for i in range(min(n_shift, len(raw))):
        s = raw[i]
        fhr_raw = np.asarray(s['fhr'])
        up_raw = np.asarray(s['up'])
        y_st = s['fhr_st'][None, trim:-trim]
        y_ph = s['fhr_ph'][None, trim:-trim]
        curve = []
        for sh in SHIFTS_S:
            up_s = np.roll(up_raw, int(sh * 4))
            x2 = torch.from_numpy(np.stack([fhr_raw, up_s])[None]).float()
            res = sc(x=x2, compute_phase=False, compute_cross_phase=True,
                     scattering_channel=0, phase_channels=[0, 1])
            cr = res['cross_phase_corr'][:, cross_mask, :]     # (1, 130, 360)
            # normalize in (B, C, S) layout — what normalize_tensor_data's
            # per-channel broadcast actually requires (hdf5_dataset.py:82-135).
            # NOTE: the reference's own shift analysis transposes FIRST
            # (graph_model.py:1337-1350), which makes the (C,1) stats
            # broadcast throw; its per-sample try/except (:1439-1441)
            # silently swallows that, so the reference analysis as written
            # produces no results. Normalizing pre-transpose is the working
            # semantics.
            cr = normalize_tensor_data(
                data=cr, field_name='fhr_up_ph',
                normalization_stats=raw.normalization_stats,
                log_norm_channels_config=raw.log_norm_channels_config,
                asinh_norm_channels_config=raw.asinh_norm_channels_config,
                log_epsilon=raw.log_epsilon, pin_memory=False,
                normalize_fields=raw.normalize_fields,
                dtype=torch.float32)
            x_ph = cr.transpose(1, 2)[:, trim:-trim].float()  # (1, 300, 130)
            curve.append(float(model.measure_transfer_entropy(
                y_st, y_ph, x_ph, reduce_mean=True)))
        shift_curves.append(curve)

json.dump({"te": te, "te_ablated": te_abl, "shift_seconds": SHIFTS_S,
           "shift_te": shift_curves}, open(out_path, 'w'))
print("wrote", out_path)
