"""Measure the reference (torch CPU) scattering+VAE fwd-bwd throughput."""
import sys, time
import scipy.special as sp
if not hasattr(sp, 'sph_harm'): sp.sph_harm = sp.sph_harm_y
sys.path.insert(0, '/root/reference/kymatio')
sys.path.insert(0, '/root/reference/hdf5_dataset')
sys.path.insert(0, '/root/reference/model')
import numpy as np, torch
torch.manual_seed(0)
from kymatio_phase_scattering import KymatioPhaseScattering1D
from vae_teb_model import SeqVaeTeb

dev = torch.device('cpu')
B = 2
sc = KymatioPhaseScattering1D(J=11, Q=4, T=16, shape=5760, device=dev, max_order=1)
sel = sc.get_optimal_coefficients_for_fhr(11, 4, 16)
pm = sel['recommendations']['use_phase_mask']; cm = sel['recommendations']['use_cross_mask']
model = SeqVaeTeb().to(dev)
opt = torch.optim.AdamW(model.parameters(), lr=1e-4)

rng = np.random.default_rng(0)
fhr = torch.from_numpy(rng.standard_normal((B, 5760)).astype(np.float32))
up = torch.from_numpy(rng.standard_normal((B, 5760)).astype(np.float32))
x2 = torch.stack([fhr, up], dim=1)

def scattering_step():
    with torch.no_grad():
        o1 = sc(fhr, compute_phase=True, compute_cross_phase=False)
        o2 = sc(x2, compute_phase=False, compute_cross_phase=True)
    st = o1['scattering']; ph = o1['phase_corr'][:, pm, :]; cr = o2['cross_phase_corr'][:, cm, :]
    return st, ph, cr

def vae_step(st, ph, cr, raw):
    out = model(st.transpose(1,2)[:, 30:330], ph.transpose(1,2)[:, 30:330], cr.transpose(1,2)[:, 30:330])
    losses = model.compute_loss(out, st.transpose(1,2)[:, 30:330], ph.transpose(1,2)[:, 30:330], raw, beta=1e-5)
    opt.zero_grad(); losses['total_loss'].backward(); opt.step()
    return float(losses['total_loss'])

raw = torch.from_numpy(rng.standard_normal((B, 4800)).astype(np.float32))
# warmup
st, ph, cr = scattering_step(); vae_step(st, ph, cr, raw)

n = 5
t0 = time.time()
for _ in range(n): st, ph, cr = scattering_step()
t_scat = (time.time()-t0)/n
t0 = time.time()
for _ in range(n): vae_step(st, ph, cr, raw)
t_vae = (time.time()-t0)/n
total = t_scat + t_vae
print(f"REF_CPU scattering: {t_scat*1000:.1f} ms/batch{B} = {B/t_scat:.3f} win/s")
print(f"REF_CPU vae fwd-bwd: {t_vae*1000:.1f} ms/batch{B} = {B/t_vae:.3f} win/s")
print(f"REF_CPU pipeline: {total*1000:.1f} ms/batch{B} = {B/total:.4f} windows/sec")
