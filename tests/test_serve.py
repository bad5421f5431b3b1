"""Serving artifacts: jax.export roundtrips and streaming sessions.

The reference deploys by unpickling the Lightning checkpoint into a
Python process (graph_model.py run_tests); serve.py's contract is that a
serialized StableHLO artifact reproduces the live model bit-for-bit and
survives batch-size changes via the symbolic batch dimension.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_teb_tpu.models import SeqVaeTeb
from vae_teb_tpu import serve

CPU = jax.devices("cpu")[0]
S = 16


@pytest.fixture(scope="module")
def model_state():
    model = SeqVaeTeb()
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    with jax.default_device(CPU):
        batch = {
            "fhr_st": r.standard_normal((2, S, 43)).astype(np.float32),
            "fhr_ph": r.standard_normal((2, S, 44)).astype(np.float32),
            "fhr_up_ph": r.standard_normal((2, S, 130)).astype(np.float32),
        }
        variables = model.init(
            {"params": rng, "sample": rng}, jnp.asarray(batch["fhr_st"]),
            jnp.asarray(batch["fhr_ph"]), jnp.asarray(batch["fhr_up_ph"]),
            train=False)
    return model, variables, batch


def _direct(model, variables, batch):
    return model.apply(variables, jnp.asarray(batch["fhr_st"]),
                       jnp.asarray(batch["fhr_ph"]),
                       jnp.asarray(batch["fhr_up_ph"]),
                       train=False, deterministic=True)


def test_export_inference_roundtrip_poly_batch(model_state, tmp_path):
    """Serialize -> file -> deserialize -> call at TWO batch sizes neither
    equal to the example batch; outputs must match a live apply()."""
    model, variables, batch = model_state
    with jax.default_device(CPU):
        exp = serve.export_inference(model, variables, batch)
        path = os.path.join(tmp_path, "seqvaeteb.stablehlo")
        n = serve.save_artifact(exp, path)
        assert n > 0 and os.path.getsize(path) == n
        art = serve.load_artifact(path)

        r = np.random.default_rng(3)
        for b in (1, 5):
            nb = {
                "fhr_st": r.standard_normal((b, S, 43)).astype(np.float32),
                "fhr_ph": r.standard_normal((b, S, 44)).astype(np.float32),
                "fhr_up_ph": r.standard_normal((b, S, 130)).astype(np.float32),
            }
            got = art.call(variables, jnp.asarray(nb["fhr_st"]),
                           jnp.asarray(nb["fhr_ph"]),
                           jnp.asarray(nb["fhr_up_ph"]))
            want = _direct(model, variables, nb)
            assert set(got) == set(want)
            # not bitwise: the symbolic-batch program lowers with different
            # tiling/fusion choices than the concrete-shape one, so fp32
            # matmul reduction order differs (observed ~2e-5 on the deep
            # head chains)
            for k in want:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(want[k]),
                    rtol=0, atol=1e-4, err_msg=f"batch {b}, output {k}")


def test_export_inference_bundled_params(model_state, tmp_path):
    """bundle_params=True bakes the weights in: the artifact is called with
    inputs only and must still match the live model."""
    model, variables, batch = model_state
    with jax.default_device(CPU):
        exp = serve.export_inference(model, variables, batch,
                                     bundle_params=True,
                                     batch_polymorphic=False)
        path = os.path.join(tmp_path, "bundled.stablehlo")
        serve.save_artifact(exp, path)
        art = serve.load_artifact(path)
        got = art.call(jnp.asarray(batch["fhr_st"]),
                       jnp.asarray(batch["fhr_ph"]),
                       jnp.asarray(batch["fhr_up_ph"]))
        want = _direct(model, variables, batch)
        # weights-as-constants lets XLA constant-fold/fuse differently than
        # the weights-as-arguments program: same reduction-order noise as
        # the polymorphic roundtrip above
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=0, atol=1e-4, err_msg=k)


def test_export_source_stream_roundtrip(model_state, tmp_path):
    """The exported streaming step, chained over chunks, must equal the
    live full-sequence source encode (state threads through the
    artifact)."""
    model, variables, batch = model_state
    with jax.default_device(CPU):
        chunk_len = 4
        exp = serve.export_source_stream(model, variables, batch_size=2,
                                         chunk_len=chunk_len)
        path = os.path.join(tmp_path, "stream.stablehlo")
        serve.save_artifact(exp, path)
        art = serve.load_artifact(path)

        x = jnp.asarray(batch["fhr_up_ph"])
        state = jax.tree.map(jnp.asarray,
                             model.init_source_stream_state(2))
        outs = []
        for lo in range(0, S, chunk_len):
            mu, state = art.call(variables, x[:, lo:lo + chunk_len], state)
            outs.append(np.asarray(mu))
        full = model.apply(variables, x, S - 1,
                           method="get_sequence_encoding")
        np.testing.assert_allclose(np.concatenate(outs, axis=1),
                                   np.asarray(full), rtol=0, atol=1e-5)


def test_export_cross_platform_lowering(model_state):
    """platforms=('tpu','cpu') lowers the module for a TPU serving fleet
    from this CPU build host (no TPU attached) — the deploy story serve.py
    claims. The dual-platform artifact must roundtrip and still execute on
    the platform we do have."""
    model, variables, batch = model_state
    with jax.default_device(CPU):
        exp = serve.export_inference(model, variables, batch,
                                     platforms=("tpu", "cpu"))
        art = jax.export.deserialize(bytearray(exp.serialize()))
        assert art.platforms == ("tpu", "cpu")
        got = art.call(variables, jnp.asarray(batch["fhr_st"]),
                       jnp.asarray(batch["fhr_ph"]),
                       jnp.asarray(batch["fhr_up_ph"]))
        want = _direct(model, variables, batch)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=0, atol=1e-4, err_msg=k)


def test_streaming_session(model_state):
    """StreamingSession carries state internally and reproduces the full
    causal encode over uneven chunk boundaries."""
    model, variables, batch = model_state
    with jax.default_device(CPU):
        x = jnp.asarray(batch["fhr_up_ph"])
        sess = serve.StreamingSession(model, variables, batch_size=2)
        outs = [np.asarray(sess.step(x[:, lo:hi]))
                for lo, hi in ((0, 3), (3, 4), (4, 11), (11, 16))]
        full = model.apply(variables, x, S - 1,
                           method="get_sequence_encoding")
        np.testing.assert_allclose(np.concatenate(outs, axis=1),
                                   np.asarray(full), rtol=0, atol=1e-5)
        # session state is exposed for checkpoint/resume
        assert "h" in sess.state and "conv_tails" in sess.state
