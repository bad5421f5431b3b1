"""Serving: ahead-of-time compiled artifacts and streaming sessions.

The reference has no deployment path beyond "load the Lightning
checkpoint in a Python process and call the torch module"
(/root/reference/model/graph_model.py run_tests; predict_st_model/
model_main_predict.py does the same for the variants). The TPU-native
equivalent is ahead-of-time lowering: `jax.export` serializes the jitted
inference function to a versioned StableHLO artifact that a serving
runtime executes with NO Python model code, lowered for the target
platform (TPU serving fleet) from any build host, with an optional
symbolic batch dimension so one artifact serves every batch size.

Two artifact flavors:
  - weights-as-argument (default): the artifact is a pure program; the
    serving runtime feeds the checkpoint's variables pytree as the first
    argument. Artifacts stay small and one program serves many
    checkpoints.
  - bundled (`bundle_params=True`): variables are baked into the module
    as constants — a single self-contained file (the production model
    embeds ~376 MB of fp32 parameters; use for small/distilled models).

For interactive/low-latency serving there is `StreamingSession`: a
stateful causal source-encode session built on
`SeqVaeTeb.encode_source_stream` (chunk in, mu_x chunk out, LSTM/conv
state carried on device), the incremental entry the reference only
sketches (vae_teb_model.py:723-740 recomputes the full forward per
timestep).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

__all__ = [
    "export_inference", "export_source_stream", "save_artifact",
    "load_artifact", "StreamingSession",
]


def _inference_fn(model) -> Callable:
    """Deterministic full forward: (variables, y_st, y_ph, x_ph) ->
    output dict (posterior mean latent, coefficient reconstruction,
    raw-signal mu/logvar). No rng: deterministic=True uses mu_post."""

    def infer(variables, y_st, y_ph, x_ph):
        return model.apply(variables, y_st, y_ph, x_ph,
                           train=False, deterministic=True)

    return infer


def export_inference(model, variables, example_batch: Dict[str, Any],
                     *, batch_polymorphic: bool = True,
                     platforms: Optional[Sequence[str]] = None,
                     bundle_params: bool = False) -> jax_export.Exported:
    """Lower the deterministic forward to a serializable artifact.

    example_batch: dict with "fhr_st"/"fhr_ph"/"fhr_up_ph" arrays (any
    batch size) fixing the per-window shapes and dtypes. With
    batch_polymorphic the leading axis is exported as the symbolic
    dimension "b" (one artifact, every batch size); sequence length and
    channel counts stay static, as XLA requires for MXU tiling.

    platforms: e.g. ("tpu",) to cross-lower for a TPU serving fleet from
    a CPU build host, or ("tpu", "cpu") for a dual-platform module.
    None = the exporting host's default platform.
    """
    inputs = tuple(np.asarray(example_batch[k])
                   for k in ("fhr_st", "fhr_ph", "fhr_up_ph"))
    fn = _inference_fn(model)
    if bundle_params:
        wrapped = lambda y_st, y_ph, x_ph: fn(variables, y_st, y_ph, x_ph)
        args, specs = inputs, ("b, _, _",) * 3
    else:
        wrapped = fn
        args, specs = (variables,) + inputs, (None,) + ("b, _, _",) * 3
    if batch_polymorphic:
        args = jax_export.symbolic_args_specs(args, specs)
    return jax_export.export(jax.jit(wrapped), platforms=platforms)(*args)


def export_source_stream(model, variables, *, batch_size: int,
                         chunk_len: int, n_channels: int = 130,
                         platforms: Optional[Sequence[str]] = None,
                         bundle_params: bool = False) -> jax_export.Exported:
    """Lower one streaming source-encode step to an artifact:
    (variables?, x_chunk (B, chunk_len, C), state) -> (mu_x chunk, state).

    The carried state (causal-conv tails + LSTM h/c) is an explicit
    argument/result, so the serving runtime owns session state and the
    program stays pure — chained calls reproduce the full-sequence encode
    exactly (tested in tests/test_models.py's streaming parity).
    Batch is static here: streaming sessions run at a fixed fleet batch,
    and the state shapes are batch-dependent."""
    init_state = model.init_source_stream_state(batch_size)
    chunk = np.zeros((batch_size, chunk_len, n_channels), np.float32)

    def step(variables, x_chunk, state):
        return model.apply(variables, x_chunk, state,
                           method="encode_source_stream")

    if bundle_params:
        wrapped = lambda x_chunk, state: step(variables, x_chunk, state)
        args = (chunk, init_state)
    else:
        wrapped = step
        args = (variables, chunk, init_state)
    return jax_export.export(jax.jit(wrapped), platforms=platforms)(*args)


def save_artifact(exported: jax_export.Exported, path: str) -> int:
    """Serialize to a versioned binary file; returns the byte count."""
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_artifact(path: str) -> jax_export.Exported:
    """Deserialize an artifact; run it with `.call(*args)` (jit-compatible:
    the embedded StableHLO is spliced into the caller's program)."""
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


class StreamingSession:
    """Stateful low-latency causal source encoding.

    One session per stream batch: feed raw phase-channel chunks
    (B, S_chunk, C) as they arrive; each `step` returns that chunk's
    causal latent encoding mu_x and keeps the carried conv/LSTM state on
    device. Equivalent to re-running the full encoder over everything
    seen so far (exact, eval-mode), at per-chunk instead of
    per-history cost — the serving fix for the reference's
    get_sequence_encoding, which recomputes the full forward every call
    (vae_teb_model.py:723-740).
    """

    def __init__(self, model, variables, batch_size: int):
        self._variables = variables
        self._state = jax.tree.map(
            jnp.asarray, model.init_source_stream_state(batch_size))
        self._step = jax.jit(
            lambda v, x, s: model.apply(v, x, s,
                                        method="encode_source_stream"))

    def step(self, x_chunk) -> jnp.ndarray:
        mu, self._state = self._step(self._variables,
                                     jnp.asarray(x_chunk), self._state)
        return mu

    @property
    def state(self):
        """Carried state pytree (checkpoint it to resume a session)."""
        return self._state

    @state.setter
    def state(self, value):
        self._state = value
