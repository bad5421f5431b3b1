"""Convert a parity-run pickle ({params, batch_stats}, written by
elbo_parity_jax_side.py) into an Orbax Checkpointer directory that
`cli test --checkpoint DIR` can restore — so the reference-scale
evaluation battery (VERDICT round-5 ask #6) probes the TRAINED model, not
a fresh init.

Builds the full TrainState around the pickled variables without running
the flax-init compile (tx.init on the loaded params is host-cheap; the
structure matches what cmd_test's init_state produces, which is all
StandardCheckpointer needs to restore).

Usage: python benchmarks/pkl_to_ckpt.py ckpt.pkl out_dir
       (run from /root/repo; CPU is fine: `env -u JAX_PLATFORMS -u
       XLA_FLAGS PYTHONPATH=/root/repo JAX_PLATFORMS=cpu ...`)
"""
import pickle
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from vae_teb_tpu.models import SeqVaeTeb
from vae_teb_tpu.train import Checkpointer, Trainer, TrainerConfig
from vae_teb_tpu.train.trainer import TrainState

pkl_path, out_dir = sys.argv[1], sys.argv[2]
with open(pkl_path, "rb") as f:
    variables = pickle.load(f)

cfg = TrainerConfig(precision="bf16", moment_dtype="bf16")
trainer = Trainer(SeqVaeTeb(dtype=cfg.model_dtype()), cfg)
params = variables["params"]
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", FrozenDict()),
                   opt_state=trainer.tx.init(params),
                   rng=jax.random.PRNGKey(cfg.seed))
ckpt = Checkpointer(out_dir, keep=2)
ckpt.save(state, step=300, metric=0.0)
print("wrote checkpoint to", out_dir)
