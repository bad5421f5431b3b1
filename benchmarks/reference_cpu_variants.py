"""Measure the reference (torch CPU) variant/classifier model speeds.

Fills the reference-side column of BASELINE.md rows 3/4 for the pieces of
the reference that actually run (the fold driver and the raw-window variant
are non-runnable: external imports / syntax error — SURVEY.md §7.5):

  a) bare FHRInceptionTimeClassifier (inception_time.py:185), fwd and
     fwd+CE+bwd+AdamW on (32, 300, 32) latents
  b) SeqVaeTebClassifier (vae_teb_model.py:1248), unfrozen VAE, full
     train step on production-shape inputs, batch 32
  c) prediction_directly SeqVaeTeb (vae_teb_model_prediction_directly.py),
     full train step (fwd + sliding-window NLL + KLD + bwd + AdamW)

Usage: python reference_cpu_variants.py [batch] [iters]
"""
import sys, time, json
sys.path.insert(0, '/root/reference/model')
import numpy as np, torch
torch.manual_seed(0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_ITER = int(sys.argv[2]) if len(sys.argv) > 2 else 3
S, Z = 300, 32
rng = np.random.default_rng(0)
results = {}


def bench(name, fn, n=N_ITER):
    try:
        fn()  # warmup
    except Exception as e:
        results[name] = {"error": repr(e)}
        print(f"{name}: NOT RUNNABLE — {e!r}")
        return
    t0 = time.time()
    for _ in range(n):
        fn()
    dt = (time.time() - t0) / n
    results[name] = {"ms_per_batch": round(dt * 1000, 1),
                     "windows_per_sec": round(B / dt, 2), "batch": B}
    print(f"{name}: {dt*1000:.1f} ms/batch{B} = {B/dt:.2f} win/s")


# -- a) bare InceptionTime ----------------------------------------------------
from inception_time import FHRInceptionTimeClassifier

clf = FHRInceptionTimeClassifier(input_size=Z)
z = torch.from_numpy(rng.standard_normal((B, S, Z)).astype(np.float32))
labels = torch.from_numpy((rng.random(B) < 0.5).astype(np.int64))

clf.eval()
with torch.no_grad():
    bench("inception_time_forward", lambda: clf(z))

clf.train()
opt = torch.optim.AdamW(clf.parameters(), lr=1e-4)
ce = torch.nn.CrossEntropyLoss()


def clf_step():
    opt.zero_grad()
    loss = ce(clf(z), labels)
    loss.backward()
    opt.step()


bench("inception_time_train_step", clf_step)

# NOTE (measured here): both InceptionTime benches crash with
# "Expected size 300 but got size 301" at inception_time.py:113 — the
# k=40 branch uses padding=k//2=20, which on even kernels yields L+1 in
# torch, so the reference classifier forward is NOT runnable at any
# sequence length as written. The new framework's SAME-padded conv fixes
# this (vae_teb_tpu/models/inception_time.py).

# -- b) SeqVaeTebClassifier, unfrozen VAE ------------------------------------
from vae_teb_model import SeqVaeTebClassifier

y_st = torch.from_numpy(rng.standard_normal((B, S, 43)).astype(np.float32))
y_ph = torch.from_numpy(rng.standard_normal((B, S, 44)).astype(np.float32))
x_ph = torch.from_numpy(rng.standard_normal((B, S, 130)).astype(np.float32))
y_raw = torch.from_numpy(rng.standard_normal((B, S * 16)).astype(np.float32))

vclf = SeqVaeTebClassifier(freeze_vae=False)
vopt = torch.optim.AdamW(vclf.parameters(), lr=1e-4)


def vclf_step():
    vopt.zero_grad()
    losses = vclf.compute_loss(y_st, y_ph, x_ph, labels)
    losses["total_loss"].backward()
    vopt.step()


bench("seqvae_classifier_train_step", vclf_step)

# -- c) prediction_directly variant ------------------------------------------
import vae_teb_model_prediction_directly as pd_mod

# this variant hard-codes 76 channels in its SourceEncoder AND
# TargetEncoder MLP/conv stacks (vae_teb_model_prediction_directly.py:
# 385-419, 585-598), so it only runs when y_st, y_ph AND x_ph are all
# 76-channel — shapes incompatible with the production 43/44/130 schema.
# Benchmarked at its designed all-76 shapes so a reference-side number
# exists at all.
pdm = pd_mod.SeqVaeTeb(input_channels=76)
popt = torch.optim.AdamW(pdm.parameters(), lr=1e-4)
t76 = lambda: torch.from_numpy(
    rng.standard_normal((B, S, 76)).astype(np.float32))
y_st76, y_ph76, x_ph76 = t76(), t76(), t76()


def pd_step():
    popt.zero_grad()
    out = pdm(y_st76, y_ph76, x_ph76)
    losses = pdm.compute_loss(out, y_raw)
    total = losses["reconstruction_loss"] + 1e-5 * losses["kld_loss"]
    total.backward()
    popt.step()


bench("prediction_directly_train_step", pd_step)

print(json.dumps(results))
