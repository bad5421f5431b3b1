"""Train this framework's SeqVaeTeb on the same dataset, same schedule.

Usage: python elbo_parity_jax_side.py [steps] [data_dir] [save_path]
           [precision] [moment_dtype] [lstm_schedule]
Defaults reproduce the round-1 60-step experiment; save_path pickles the
final params/batch_stats for the behavioral comparison
(parity_behavior_jax.py). precision: fp32 (default) or bf16 — bf16 is the
production policy (the reference trains 16-mixed, graph_model.py:510) and
the round-3 long-horizon parity evidence runs it. moment_dtype bf16
additionally stores the Adam moments in bf16 (the full production bench
configuration).
"""
import sys, time, json, pickle
sys.path.insert(0, '/root/repo')
import numpy as np, jax
from vae_teb_tpu.data import CombinedHDF5Dataset
from vae_teb_tpu.models import SeqVaeTeb
from vae_teb_tpu.parallel import data_parallel_mesh
from vae_teb_tpu.train import Trainer, TrainerConfig

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
data_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/parity'
save_path = sys.argv[3] if len(sys.argv) > 3 else None
precision = sys.argv[4] if len(sys.argv) > 4 else 'fp32'
moment_dtype = sys.argv[5] if len(sys.argv) > 5 else 'fp32'
lstm_schedule = sys.argv[6] if len(sys.argv) > 6 else 'wavefront'
# seed (round 5): varies the init/reparam trajectory so checkpoint-level
# behavioral probes (parity_behavior_jax.py) can be separated from
# trajectory noise — the cross-framework protocol itself always uses the
# default (reparam RNGs differ between frameworks anyway, BASELINE.md).
seed = int(sys.argv[7]) if len(sys.argv) > 7 else 42

ds = CombinedHDF5Dataset(f'{data_dir}/p.h5', stats_path=f'{data_dir}/ps.h5',
                         trim_minutes=2.0, cache_size=0)
mesh = data_parallel_mesh(devices=jax.devices()[:1])
cfg = TrainerConfig(lr=1e-3, grad_clip_norm=0.5, weight_decay=1e-4,
                    precision=precision, moment_dtype=moment_dtype,
                    seed=seed)
trainer = Trainer(SeqVaeTeb(dtype=cfg.model_dtype(),
                            lstm_schedule=lstm_schedule), cfg, mesh=mesh)
B = 4
order = np.arange(len(ds))
state = trainer.init_state(ds.collate(order[:B]))
losses = []
t0 = time.time()
for step in range(steps):
    idx = order[(step * B) % len(ds):(step * B) % len(ds) + B]
    if len(idx) < B: idx = order[:B]
    batch = ds.collate(idx)
    state, m = trainer.train_step(state, batch, beta=1e-5)
    losses.append({k: float(v) for k, v in m.items()})
if save_path:
    with open(save_path, 'wb') as f:
        pickle.dump({"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}, f)
print(json.dumps({"losses": losses, "seconds": time.time()-t0}))
