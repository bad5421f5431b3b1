"""Behavioral probes of the TRAINED vae_teb_tpu model: per-sample TE,
UP-ablation TE drop, TE-vs-shift curve — the JAX half of the cross-framework
behavioral comparison (see parity_behavior_torch.py for the torch half).

Usage: python parity_behavior_jax.py ckpt.pkl data_dir out.json [n_te] [n_shift] [precision] [frontend]
precision bf16 probes the checkpoint under the same compute policy it was
trained with. frontend `reduced` gives the shift analysis (the one probe
that recomputes coefficients from raw signals) the reduced+bf16
production frontend, matching a checkpoint trained on
`build-data --bf16-frontend --reduced-frontend` coefficients; default
`exact` is the fp32/HIGHEST golden-parity frontend.
"""
import sys, json, pickle
sys.path.insert(0, '/root/repo')
import numpy as np, jax.numpy as jnp
from vae_teb_tpu.data import CombinedHDF5Dataset, load_stats
from vae_teb_tpu.eval import ModelEvaluator
from vae_teb_tpu.models import SeqVaeTeb
from vae_teb_tpu.ops import PhaseScattering1D

ckpt, data_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
n_te = int(sys.argv[4]) if len(sys.argv) > 4 else 32
n_shift = int(sys.argv[5]) if len(sys.argv) > 5 else 2
precision = sys.argv[6] if len(sys.argv) > 6 else 'fp32'
frontend = sys.argv[7] if len(sys.argv) > 7 else 'exact'
# 'exact' = fp32/HIGHEST golden-parity frontend; 'bf16' = bf16 correlation
# stage only (cli --bf16-frontend); 'reduced' = reduced-rate + bf16 (the
# production pair, cli --reduced-frontend --bf16-frontend). Validated so a
# typo cannot silently select the exact frontend (round-4 advisor finding).
assert precision in ('fp32', 'bf16'), f"unknown precision {precision!r}"
assert frontend in ('exact', 'bf16', 'reduced'), (
    f"unknown frontend {frontend!r}")
SHIFTS_S = [-60, -45, -30, -15, 0]

with open(ckpt, 'rb') as f:
    variables = pickle.load(f)
model = SeqVaeTeb(dtype=jnp.bfloat16 if precision == 'bf16' else None)

ds = CombinedHDF5Dataset(f'{data_dir}/p.h5', stats_path=f'{data_dir}/ps.h5',
                         trim_minutes=2.0, cache_size=0)
raw = CombinedHDF5Dataset(f'{data_dir}/p.h5', stats_path=f'{data_dir}/ps.h5',
                          normalize_fields=('fhr_st', 'fhr_ph', 'fhr_up_ph'),
                          cache_size=0, allow_stats_trim_mismatch=True)

sc = PhaseScattering1D(J=11, Q=4, T=16, shape=5760, max_order=1,
                       correlation_dtype=(jnp.bfloat16
                                          if frontend in ('bf16', 'reduced')
                                          else None),
                       reduced_rate=frontend == 'reduced')
sel = sc.optimal_fhr_selection()
stats = load_stats(f'{data_dir}/ps.h5')
ev = ModelEvaluator(model, variables, scattering=sc, stats=stats,
                    cross_subset=sel["cross_selection"]["selected_indices"],
                    trim_decimated=30)

te, te_abl = [], []
for i in range(min(n_te, len(ds))):
    s = ds[i]
    args = (jnp.asarray(s["fhr_st"][None]), jnp.asarray(s["fhr_ph"][None]),
            jnp.asarray(s["fhr_up_ph"][None]))
    te.append(float(np.asarray(ev._te(*args)).mean()))
    te_abl.append(float(np.asarray(
        ev._te(args[0], args[1], jnp.zeros_like(args[2]))).mean()))

shift_curves = []
for i in range(min(n_shift, len(raw))):
    s = raw[i]
    res = ev.te_shift_analysis(s["fhr"], s["up"], s["fhr_st"], s["fhr_ph"],
                               shift_seconds=SHIFTS_S)
    shift_curves.append([float(x) for x in res["te"]])

json.dump({"te": te, "te_ablated": te_abl, "shift_seconds": SHIFTS_S,
           "shift_te": shift_curves}, open(out_path, 'w'))
print("wrote", out_path)
