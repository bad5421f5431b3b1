#!/usr/bin/env bash
# Launch training on all local TPU devices (the reference's run_train_ddp.sh
# torchrun equivalent — no process launcher needed: the jitted step spans
# the whole local mesh; multi-host slices add jax.distributed.initialize).
set -euo pipefail
cd "$(dirname "$0")"
CONFIG="${1:-configs/default.yaml}"
python -m vae_teb_tpu.cli train --config "$CONFIG" --root "$(pwd)"
