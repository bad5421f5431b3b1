"""Train this framework's SeqVaeTeb on the same dataset, same schedule."""
import sys, time, json
sys.path.insert(0, '/root/repo')
import numpy as np, jax
from vae_teb_tpu.data import CombinedHDF5Dataset
from vae_teb_tpu.models import SeqVaeTeb
from vae_teb_tpu.parallel import data_parallel_mesh
from vae_teb_tpu.train import Trainer, TrainerConfig

ds = CombinedHDF5Dataset('/tmp/parity/p.h5', stats_path='/tmp/parity/ps.h5',
                         trim_minutes=2.0, cache_size=0)
mesh = data_parallel_mesh(devices=jax.devices()[:1])
trainer = Trainer(SeqVaeTeb(), TrainerConfig(lr=1e-3, grad_clip_norm=0.5,
                                             weight_decay=1e-4), mesh=mesh)
B = 4
order = np.arange(len(ds))
state = trainer.init_state(ds.collate(order[:B]))
losses = []
steps = 60
t0 = time.time()
for step in range(steps):
    idx = order[(step * B) % len(ds):(step * B) % len(ds) + B]
    if len(idx) < B: idx = order[:B]
    batch = ds.collate(idx)
    state, m = trainer.train_step(state, batch, beta=1e-5)
    losses.append({k: float(v) for k, v in m.items()})
print(json.dumps({"losses": losses, "seconds": time.time()-t0}))
