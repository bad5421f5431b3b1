"""Train the torch reference SeqVaeTeb on the shared synthetic dataset.

Usage: python elbo_parity_torch_side.py [steps] [data_dir] [save_path]
Defaults (60, /tmp/parity, none) reproduce the round-1 experiment recorded
in BASELINE.md; round 2 extends it to 300+ steps with a saved checkpoint
for the behavioral comparison (parity_behavior_torch.py).
"""
import sys, time, json
import scipy.special as sp
if not hasattr(sp, 'sph_harm'): sp.sph_harm = sp.sph_harm_y
sys.path.insert(0, '/root/reference/kymatio')
sys.path.insert(0, '/root/reference/hdf5_dataset')
sys.path.insert(0, '/root/reference/model')
import numpy as np, torch
torch.manual_seed(0)
from hdf5_dataset import CombinedHDF5Dataset
from vae_teb_model import SeqVaeTeb

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
data_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/parity'
save_path = sys.argv[3] if len(sys.argv) > 3 else None

ds = CombinedHDF5Dataset(f'{data_dir}/p.h5', stats_path=f'{data_dir}/ps.h5',
                         trim_minutes=2.0, cache_size=0, pin_memory=False)
model = SeqVaeTeb()
opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-4)
B = 4
order = np.arange(len(ds))
losses = []
t0 = time.time()
for step in range(steps):
    idx = order[(step * B) % len(ds):(step * B) % len(ds) + B]
    if len(idx) < B: idx = order[:B]
    batch = [ds[int(j)] for j in idx]
    y_st = torch.stack([b['fhr_st'] for b in batch])
    y_ph = torch.stack([b['fhr_ph'] for b in batch])
    x_ph = torch.stack([b['fhr_up_ph'] for b in batch])
    y_raw = torch.stack([b['fhr'] for b in batch])
    out = model(y_st, y_ph, x_ph)
    l = model.compute_loss(out, y_st, y_ph, y_raw, beta=1e-5)
    opt.zero_grad(); l['total_loss'].backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), 0.5)
    opt.step()
    losses.append({k: float(v) for k, v in l.items() if v is not None and hasattr(v, 'item')})
if save_path:
    torch.save(model.state_dict(), save_path)
print(json.dumps({"losses": losses, "seconds": time.time()-t0}))
