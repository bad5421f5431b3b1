"""Training stack: jitted steps, data-parallel parity, checkpointing,
schedules, config."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from vae_teb_tpu.models import SeqVaeTeb
from vae_teb_tpu.parallel import data_parallel_mesh
from vae_teb_tpu.train import (Checkpointer, Trainer, TrainerConfig,
                               beta_schedule, cosine_warm_restarts,
                               load_config, make_optimizer, save_config,
                               transfer_params, RunConfig)

S = 16  # short sequences keep the decoder heads tiny


class MiniVae(nn.Module):
    """Tiny stand-in exposing SeqVaeTeb's exact training interface (forward
    dict + compute_loss + batch_stats + sample rng) so trainer-machinery
    tests don't pay the full model's XLA compile each time. Full-model
    training-step coverage lives in __graft_entry__.dryrun_multichip and
    bench.py."""

    @nn.compact
    def __call__(self, y_st, y_ph, x_ph, train=True, deterministic=False):
        h = jnp.concatenate([y_st, y_ph, x_ph], axis=-1)
        # no bias into BatchNorm: a pre-BN bias has a mathematically-zero
        # gradient, which AdamW turns into amplified reduction-order noise —
        # it would break cross-topology parity tests for no modeling gain
        # (the real model's conv blocks are use_bias=False for this reason)
        h = nn.Dense(32, use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.1)(h)
        h = nn.relu(h)
        mu_post = nn.Dense(8)(h)
        logvar_post = nn.Dense(8)(h)
        mu_prior = nn.Dense(8)(h)
        logvar_prior = jnp.zeros_like(mu_prior)
        if deterministic:
            z = mu_post
        else:
            eps = jax.random.normal(self.make_rng("sample"), mu_post.shape)
            z = mu_post + eps * jnp.exp(0.5 * logvar_post)
        lin = nn.Dense(87)(z)
        raw = nn.Dense(16)(z).reshape(z.shape[0], -1)
        return {"z": z, "linear_output": lin, "mu_pr": raw,
                "logvar_pr": jnp.zeros_like(raw), "mu_prior": mu_prior,
                "logvar_prior": logvar_prior, "mu_post": mu_post,
                "logvar_post": logvar_post}

    compute_loss = staticmethod(SeqVaeTeb.compute_loss)


def make_batch(rng, b=8):
    return {
        "fhr_st": rng.standard_normal((b, S, 43)).astype(np.float32),
        "fhr_ph": rng.standard_normal((b, S, 44)).astype(np.float32),
        "fhr_up_ph": rng.standard_normal((b, S, 130)).astype(np.float32),
        "fhr": rng.standard_normal((b, S * 16)).astype(np.float32),
    }


@pytest.fixture(scope="module")
def cpu_trainer(cpu_mesh_devices):
    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    cfg = TrainerConfig(lr=1e-3, epochs=2, kld_beta=1e-5)
    trainer = Trainer(MiniVae(), cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    state = trainer.init_state(make_batch(rng, b=2))
    return trainer, state


def test_train_step_updates_params(cpu_trainer):
    trainer, state = cpu_trainer
    batch = make_batch(np.random.default_rng(1))
    new_state, metrics = trainer.train_step(state, batch, beta=1e-5)
    assert int(new_state.step) == int(state.step) + 1
    for k in ("total_loss", "mse_loss", "nll_loss", "kld_loss", "grad_norm"):
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                        state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_donate_state_matches_and_frees(cpu_mesh_devices):
    """donate_state=True must produce the identical update (donation is an
    aliasing hint, not a semantic change) while actually releasing the old
    state's buffers — the production memory path (cli train, dryrun)."""
    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    batch = make_batch(np.random.default_rng(7))
    states, trainers = [], []
    for donate in (False, True):
        cfg = TrainerConfig(lr=1e-3, kld_beta=1e-5, donate_state=donate)
        trainer = Trainer(MiniVae(), cfg, mesh=mesh)
        s0 = trainer.init_state(make_batch(np.random.default_rng(0), b=2))
        s1, _ = trainer.train_step(s0, batch, beta=1e-5)
        states.append(s1)
        trainers.append((trainer, s0))
    ref, don = states
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(don.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the donated input really was consumed (buffers deleted)
    _, s0_donated = trainers[1]
    leaf = jax.tree.leaves(s0_donated.params)[0]
    assert leaf.is_deleted()


def test_device_normalize_matches_host(cpu_mesh_devices):
    """Trainer(normalize_stats=...) fed raw (B, C, S) unnormalized batches
    must produce the same update as a plain Trainer fed host-normalized
    (B, S, C) batches: normalization + layout fold into the compiled step
    without changing semantics (the --device-normalize ingest fast path)."""
    from vae_teb_tpu.data import default_field_stats
    from vae_teb_tpu.data.normalize import normalize_field_inplace

    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    rng = np.random.default_rng(11)
    raw = make_batch(rng)
    stats = {
        "fhr_st": default_field_stats(
            "fhr_st", rng.standard_normal(43).astype(np.float32),
            np.abs(rng.standard_normal(43)).astype(np.float32) + 0.5,
            n_channels=43),
        "fhr_ph": default_field_stats(
            "fhr_ph", rng.standard_normal(44).astype(np.float32),
            np.ones(44, np.float32), n_channels=44),
        "fhr_up_ph": default_field_stats(
            "fhr_up_ph", rng.standard_normal(130).astype(np.float32),
            np.ones(130, np.float32), n_channels=130),
        "fhr": default_field_stats("fhr", 140.0, 100.0),
    }
    # host-normalized (model-layout) twin of the raw batch
    host = {}
    raw_cs = {}
    for k in ("fhr_st", "fhr_ph", "fhr_up_ph"):
        cs = np.ascontiguousarray(np.swapaxes(raw[k], 1, 2))  # (B, C, S)
        raw_cs[k] = cs
        host[k] = np.ascontiguousarray(
            np.swapaxes(normalize_field_inplace(cs.copy(), k, stats[k],
                                                channel_axis=-2), 1, 2))
    host["fhr"] = normalize_field_inplace(raw["fhr"].copy(), "fhr",
                                          stats["fhr"])
    raw_cs["fhr"] = raw["fhr"]

    cfg = TrainerConfig(lr=1e-3, kld_beta=1e-5)
    t_host = Trainer(MiniVae(), cfg, mesh=mesh)
    t_dev = Trainer(MiniVae(), cfg, mesh=mesh, normalize_stats=stats)
    s_host = t_host.init_state(make_batch(np.random.default_rng(0), b=2))
    s_dev = t_dev.init_state(
        {k: (np.swapaxes(v, 1, 2) if v.ndim == 3 else v)
         for k, v in make_batch(np.random.default_rng(0), b=2).items()})
    for a, b in zip(jax.tree.leaves(s_host.params),
                    jax.tree.leaves(s_dev.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s_host, m_host = t_host.train_step(s_host, host, beta=1e-5)
    s_dev, m_dev = t_dev.train_step(s_dev, raw_cs, beta=1e-5)
    np.testing.assert_allclose(float(m_dev["total_loss"]),
                               float(m_host["total_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_host.params),
                    jax.tree.leaves(s_dev.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_loss_decreases_on_repeated_batch(cpu_trainer):
    trainer, state = cpu_trainer
    batch = make_batch(np.random.default_rng(2))
    losses = []
    for _ in range(8):
        state, metrics = trainer.train_step(state, batch, beta=0.0)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]


def test_eval_step_deterministic(cpu_trainer):
    trainer, state = cpu_trainer
    batch = make_batch(np.random.default_rng(3))
    m1 = trainer.eval_step(state, batch, beta=1e-5)
    m2 = trainer.eval_step(state, batch, beta=1e-5)
    assert float(m1["total_loss"]) == float(m2["total_loss"])


def test_data_parallel_matches_single_device(cpu_mesh_devices):
    """The same batch through an 8-device mesh and a 1-device mesh must
    produce identical parameter updates: sharding is an implementation
    detail, not a semantics change (sync-BN + global loss mean)."""
    import optax
    batch = make_batch(np.random.default_rng(4), b=8)
    results = []
    for n_dev in (1, 8):
        mesh = data_parallel_mesh(devices=cpu_mesh_devices[:n_dev])
        # plain SGD: the parameter delta IS the gradient (Adam would
        # amplify reduction-order noise of near-zero grads into +-lr
        # sign flips, which is not a sharding defect)
        trainer = Trainer(MiniVae(), TrainerConfig(lr=1e-2), mesh=mesh,
                          tx=optax.sgd(1e-2))
        state0 = trainer.init_state(batch)
        state, metrics = trainer.train_step(state0, batch, beta=1e-5)
        delta = jax.tree.map(lambda a, b: np.asarray(a - b),
                             jax.device_get(state.params),
                             jax.device_get(state0.params))
        results.append((float(metrics["total_loss"]), delta))
    loss1, d1 = results[0]
    loss8, d8 = results[1]
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    # tolerance scaled to the global update magnitude: leaves whose whole
    # gradient is reduction-order noise (~1e-10) must not dominate
    global_scale = max(np.abs(l).max() for l in jax.tree.leaves(d1))
    for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d8)):
        np.testing.assert_allclose(a, b, atol=1e-4 * global_scale)


def test_tensor_parallel_matches_data_parallel(cpu_mesh_devices):
    """Hybrid (4 data x 2 model) mesh vs pure 8-device DP: sharding wide
    kernels over 'model' (parallel.mesh.tensor_parallel_rule) must be an
    implementation detail — identical losses and parameter updates. With
    tp_min_dim=32, MiniVae's (217, 32) Dense kernel shards (32 % 2 == 0)
    while the (32, 87) head stays replicated (87 is odd), so the test
    exercises mixed sharded/replicated leaves through GSPMD."""
    import optax
    from vae_teb_tpu.parallel import hybrid_mesh

    batch = make_batch(np.random.default_rng(7), b=8)
    results = []
    for kind in ("dp", "tp"):
        if kind == "dp":
            mesh = data_parallel_mesh(devices=cpu_mesh_devices)
        else:
            mesh = hybrid_mesh(4, 2, devices=cpu_mesh_devices)
        trainer = Trainer(MiniVae(), TrainerConfig(lr=1e-2, tp_min_dim=32),
                          mesh=mesh, tx=optax.sgd(1e-2))
        state0 = trainer.init_state(batch)
        state, metrics = trainer.train_step(state0, batch, beta=1e-5)
        delta = jax.tree.map(lambda a, b: np.asarray(a - b),
                             jax.device_get(state.params),
                             jax.device_get(state0.params))
        results.append((float(metrics["total_loss"]), delta, state))
    (loss_dp, d_dp, _), (loss_tp, d_tp, st_tp) = results
    np.testing.assert_allclose(loss_dp, loss_tp, rtol=1e-5)
    global_scale = max(np.abs(l).max() for l in jax.tree.leaves(d_dp))
    for a, b in zip(jax.tree.leaves(d_dp), jax.tree.leaves(d_tp)):
        np.testing.assert_allclose(a, b, atol=1e-4 * global_scale)
    # the wide kernel is REALLY sharded over 'model', not just replicated
    wide = st_tp.params["Dense_0"]["kernel"]
    spec = wide.sharding.spec
    assert tuple(spec) == (None, "model"), spec

    # and AdamW with bf16 moments trains on the hybrid mesh with the
    # moments inheriting the kernel's sharding (unfused here: MiniVae's
    # leaves all sit below flat_param_fusion's 1M-element threshold, so
    # the fused path would — correctly — keep them in the replicated flat
    # vector; in the real model the 23M-element heads stay individual and
    # their moments shard, which is what this asserts at mini scale)
    mesh = hybrid_mesh(4, 2, devices=cpu_mesh_devices)
    trainer = Trainer(MiniVae(),
                      TrainerConfig(lr=1e-3, tp_min_dim=32,
                                    moment_dtype="bf16"), mesh=mesh,
                      tx=make_optimizer(1e-3, moment_dtype=jnp.bfloat16,
                                        fuse_small_params=False))
    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch, beta=1e-5)
    assert np.isfinite(float(metrics["total_loss"]))
    mu = state.opt_state[1][0].mu
    assert tuple(mu["Dense_0"]["kernel"].sharding.spec) == (None, "model")


def test_fit_loop_with_early_stop_and_checkpoint(tmp_path, cpu_mesh_devices):
    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    cfg = TrainerConfig(lr=1e-3, epochs=4, early_stop_patience=1,
                        beta_schedule="linear", beta_anneal_epochs=4)
    trainer = Trainer(MiniVae(), cfg, mesh=mesh)
    rng = np.random.default_rng(5)
    batches = [make_batch(rng) for _ in range(2)]
    state = trainer.init_state(batches[0])
    ckpt = Checkpointer(str(tmp_path / "ckpt"), keep=2)
    logs = []
    state = trainer.fit(state, lambda e: iter(batches),
                        val_batches=lambda e: iter(batches[:1]),
                        checkpointer=ckpt, log_fn=logs.append)
    assert trainer.history["train/total_loss"]
    assert trainer.history["beta"][0] == 0.0  # linear anneal starts at 0
    assert ckpt.best() is not None
    # restore roundtrip
    restored = ckpt.restore(state, best=True)
    leaves_a = jax.tree.leaves(jax.device_get(restored.params))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves_a)


def test_bf16_policy_forward_close_to_fp32(cpu_mesh_devices):
    """Same fp32 params applied under the bf16 compute policy must give the
    fp32 forward to within bf16 resolution (params are storage-fp32 in both;
    only matmul/activation precision differs). Matches the reference's
    16-mixed training mode (graph_model.py:510)."""
    with jax.default_device(cpu_mesh_devices[0]):
        rng = jax.random.PRNGKey(7)
        args = (jnp.ones((2, S, 43)) * 0.1, jnp.ones((2, S, 44)) * 0.2,
                jnp.ones((2, S, 130)) * 0.3)
        fp32 = SeqVaeTeb()
        variables = fp32.init({"params": rng, "sample": rng}, *args,
                              train=False)
        out32 = fp32.apply(variables, *args, train=False, deterministic=True)
        bf16 = SeqVaeTeb(dtype=jnp.bfloat16)
        out16 = bf16.apply(variables, *args, train=False, deterministic=True)
    # params must be identical trees (policy changes compute, not storage)
    assert jax.tree.structure(variables["params"]) is not None
    lin32 = np.asarray(out32["linear_output"], np.float32)
    lin16 = np.asarray(out16["linear_output"], np.float32)
    scale = np.abs(lin32).max() + 1e-6
    assert np.abs(lin32 - lin16).max() / scale < 0.1
    # loss math is forced back to fp32 regardless of policy
    losses = SeqVaeTeb.compute_loss(
        out16, *args[:2], jnp.ones((2, S * 16)), beta=1e-5)
    for v in losses.values():
        assert v.dtype == jnp.float32
        assert np.isfinite(float(v))


def test_bf16_training_trajectory(cpu_mesh_devices):
    """bf16 and fp32 policies must descend the same loss envelope over a
    few steps on the shipping model (small S). This is the parity test the
    reference's 16-mixed mode never had."""
    batch = make_batch(np.random.default_rng(11), b=4)
    final = {}
    for precision in ("fp32", "bf16"):
        mesh = data_parallel_mesh(devices=cpu_mesh_devices[:1])
        cfg = TrainerConfig(lr=1e-3, precision=precision, seed=42)
        trainer = Trainer(SeqVaeTeb(dtype=cfg.model_dtype()), cfg, mesh=mesh)
        state = trainer.init_state(batch)
        losses = []
        for _ in range(4):
            state, metrics = trainer.train_step(state, batch, beta=1e-5)
            losses.append(float(metrics["total_loss"]))
        assert all(np.isfinite(l) for l in losses), precision
        final[precision] = losses
    # same starting loss to bf16 tolerance, both descending
    assert abs(final["fp32"][0] - final["bf16"][0]) / abs(
        final["fp32"][0]) < 0.05
    assert final["fp32"][-1] < final["fp32"][0]
    assert final["bf16"][-1] < final["bf16"][0]


def test_trainer_config_precision_knob():
    assert TrainerConfig(precision="bf16").model_dtype() == jnp.bfloat16
    assert TrainerConfig(precision="fp32").model_dtype() is None
    with pytest.raises(ValueError):
        TrainerConfig(precision="fp8").model_dtype()


def test_grad_accumulation_matches_averaged_grads(cpu_mesh_devices):
    """accumulate_grad_batches=2 with SGD: no update after the first
    micro-batch; after the second, the applied update equals the average of
    the two micro-batch gradients (reference accumulate_grad_batches,
    graph_model.py:511)."""
    import optax
    mesh = data_parallel_mesh(devices=cpu_mesh_devices[:1])
    lr = 1e-2
    b1 = make_batch(np.random.default_rng(21), b=4)
    b2 = make_batch(np.random.default_rng(22), b=4)

    # reference per-micro-batch updates (plain SGD, no accumulation)
    ref = Trainer(MiniVae(), TrainerConfig(seed=42), mesh=mesh,
                  tx=optax.sgd(lr))
    state0 = ref.init_state(b1)
    state1, _ = ref.train_step(state0, b1, beta=1e-5)
    delta1 = jax.tree.map(lambda a, b: np.asarray(a - b),
                          jax.device_get(state1.params),
                          jax.device_get(state0.params))
    # second micro-grad from the SAME params but the post-step rng (the
    # accumulating trainer's rng advances identically per micro-step)
    state1_rewound = state1.replace(params=state0.params,
                                    batch_stats=state0.batch_stats)
    state2, _ = ref.train_step(state1_rewound, b2, beta=1e-5)
    delta2 = jax.tree.map(lambda a, b: np.asarray(a - b),
                          jax.device_get(state2.params),
                          jax.device_get(state0.params))

    acc = Trainer(MiniVae(), TrainerConfig(seed=42,
                                           accumulate_grad_batches=2),
                  mesh=mesh, tx=optax.sgd(lr))
    astate0 = acc.init_state(b1)
    astate1, _ = acc.train_step(astate0, b1, beta=1e-5)
    # micro-step 1: gradients banked, params untouched
    moved = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                         astate1.params, astate0.params)
    assert max(jax.tree.leaves(moved)) == 0.0
    astate2, _ = acc.train_step(astate1, b2, beta=1e-5)
    adelta = jax.tree.map(lambda a, b: np.asarray(a - b),
                          jax.device_get(astate2.params),
                          jax.device_get(astate0.params))
    for got, d1, d2 in zip(jax.tree.leaves(adelta), jax.tree.leaves(delta1),
                           jax.tree.leaves(delta2)):
        np.testing.assert_allclose(got, (d1 + d2) / 2.0, atol=1e-6)


def test_full_model_data_parallel_parity(cpu_mesh_devices):
    """The SHIPPING model (SeqVaeTeb, small S) through 1-device vs 8-device
    meshes: same batch => same parameter update, and a few more steps
    descend the loss. The MiniVae version of this test checks the trainer
    machinery; this one checks that nothing in the real model (BatchNorm
    batch-axis reductions, LSTM scan, reparameterization rng) breaks under
    sharding."""
    import optax
    batch = make_batch(np.random.default_rng(51), b=8)
    deltas, losses = [], []
    states = {}
    for n_dev in (1, 8):
        mesh = data_parallel_mesh(devices=cpu_mesh_devices[:n_dev])
        trainer = Trainer(SeqVaeTeb(), TrainerConfig(seed=42), mesh=mesh,
                          tx=optax.sgd(1e-2))
        state0 = trainer.init_state(batch)
        state1, metrics = trainer.train_step(state0, batch, beta=1e-5)
        delta = jax.tree.map(lambda a, b: np.asarray(a - b),
                             jax.device_get(state1.params),
                             jax.device_get(state0.params))
        deltas.append(delta)
        losses.append(float(metrics["total_loss"]))
        states[n_dev] = (trainer, state1)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    # tolerance: 0.1% of the largest update magnitude. The 8-way shard
    # changes fp32 summation order in every batch reduction (BatchNorm
    # stats, loss means, grad psum); through 4-layer LSTMs + an 8-deep
    # conv stack that legitimately perturbs small updates by ~0.05%.
    global_scale = max(np.abs(l).max() for l in jax.tree.leaves(deltas[0]))
    for a, b in zip(jax.tree.leaves(deltas[0]), jax.tree.leaves(deltas[1])):
        np.testing.assert_allclose(a, b, atol=1e-3 * global_scale)
    # multi-step descent on the 8-device mesh
    trainer, state = states[8]
    seq = [losses[1]]
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch, beta=1e-5)
        seq.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in seq)
    assert seq[-1] < seq[0]


@pytest.mark.slow
def test_full_model_tensor_parallel_parity(cpu_mesh_devices):
    """The SHIPPING model on a hybrid (4 data x 2 model) mesh vs pure
    8-device DP: with tp_min_dim=256 the decoder head kernels (raw_len =
    S*16 = 256 at this test shape; 4800 in production) shard over
    'model', and the update must match DP — through the real decoder,
    loss reductions over the sharded output axis, and BatchNorm."""
    import optax
    from vae_teb_tpu.parallel import hybrid_mesh

    batch = make_batch(np.random.default_rng(53), b=8)
    deltas, losses, last = [], [], None
    for kind in ("dp", "tp"):
        mesh = (data_parallel_mesh(devices=cpu_mesh_devices)
                if kind == "dp" else hybrid_mesh(4, 2, cpu_mesh_devices))
        trainer = Trainer(SeqVaeTeb(),
                          TrainerConfig(seed=42, tp_min_dim=256),
                          mesh=mesh, tx=optax.sgd(1e-2))
        state0 = trainer.init_state(batch)
        state1, metrics = trainer.train_step(state0, batch, beta=1e-5)
        deltas.append(jax.tree.map(lambda a, b: np.asarray(a - b),
                                   jax.device_get(state1.params),
                                   jax.device_get(state0.params)))
        losses.append(float(metrics["total_loss"]))
        last = state1
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    global_scale = max(np.abs(l).max() for l in jax.tree.leaves(deltas[0]))
    for a, b in zip(jax.tree.leaves(deltas[0]), jax.tree.leaves(deltas[1])):
        np.testing.assert_allclose(a, b, atol=1e-3 * global_scale)
    head = last.params["decoder"]["output_mu"]["Dense_0"]["kernel"]
    assert tuple(head.sharding.spec) == (None, "model"), head.sharding


@pytest.mark.slow
def test_full_model_production_shape_multidevice(cpu_mesh_devices):
    """ONE production-shape step of the shipping SeqVaeTeb (S=300, raw 4800,
    the 4800-wide heads) through the 8-device mesh with the production
    training policy (bf16 + grad accumulation): finite loss, step
    increments. Until round 3, every full-model mesh run used S=16 toy
    shapes; this is the evidence that the real configuration compiles and
    executes under sharding (compile-heavy: several minutes on this host)."""
    s = 300
    rng = np.random.default_rng(52)
    batch = {
        "fhr_st": rng.standard_normal((8, s, 43)).astype(np.float32),
        "fhr_ph": rng.standard_normal((8, s, 44)).astype(np.float32),
        "fhr_up_ph": rng.standard_normal((8, s, 130)).astype(np.float32),
        "fhr": rng.standard_normal((8, s * 16)).astype(np.float32),
    }
    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    cfg = TrainerConfig(lr=1e-3, precision="bf16", accumulate_grad_batches=2)
    trainer = Trainer(SeqVaeTeb(dtype=cfg.model_dtype()), cfg, mesh=mesh)
    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch, beta=1e-5)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1


def test_resume_continues_training(tmp_path, cpu_mesh_devices):
    """Kill-and-resume: a fresh Trainer restoring the latest checkpoint and
    continuing from start_epoch must pick up exactly where the first run
    stopped (epoch numbering continues, params carry over, histories
    concatenate) — the capability the reference only half had
    (graph_model.py:337-350 reloads weights but not optimizer state)."""
    rng = np.random.default_rng(31)
    batches = [make_batch(rng) for _ in range(2)]
    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    cfg = TrainerConfig(lr=1e-3, epochs=4)

    t1 = Trainer(MiniVae(), cfg, mesh=mesh)
    s1 = t1.init_state(batches[0])
    ckpt = Checkpointer(str(tmp_path / "ckpt"), keep=2)
    s1 = t1.fit(s1, lambda e: iter(batches), epochs=2, checkpointer=ckpt)
    steps_after_2_epochs = int(np.asarray(s1.step))

    # "crash": new process == new Trainer + template state
    t2 = Trainer(MiniVae(), cfg, mesh=mesh)
    template = t2.init_state(batches[0])
    latest = ckpt.latest()
    assert latest["step"] == 1
    restored = t2.replicate(ckpt.restore(template))
    assert int(np.asarray(restored.step)) == steps_after_2_epochs
    # params differ from a fresh init (they trained) and match the saved run
    for a, b in zip(jax.tree.leaves(jax.device_get(restored.params)),
                    jax.tree.leaves(jax.device_get(s1.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.history = dict(t1.history)  # cmd_train reloads history.pkl the same way
    s2 = t2.fit(restored, lambda e: iter(batches), epochs=4,
                checkpointer=ckpt, start_epoch=latest["step"] + 1)
    assert t2.history["epoch"] == [0, 1, 2, 3]
    assert int(np.asarray(s2.step)) == steps_after_2_epochs * 2


def test_callbacks_fire_and_failures_are_isolated(tmp_path, cpu_mesh_devices):
    from vae_teb_tpu.train import HistoryCallback, LossCurveCallback
    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    trainer = Trainer(MiniVae(), TrainerConfig(lr=1e-3), mesh=mesh)
    batches = [make_batch(np.random.default_rng(41))]
    state = trainer.init_state(batches[0])

    calls = []

    class Probe:
        def on_epoch_end(self, tr, st, epoch):
            calls.append(epoch)

        def on_fit_end(self, tr, st):
            calls.append("end")

    class Bomb:
        def on_epoch_end(self, tr, st, epoch):
            raise RuntimeError("boom")

        def on_fit_end(self, tr, st):
            raise RuntimeError("boom")

    logs = []
    hist_path = str(tmp_path / "history.pkl")
    trainer.fit(state, lambda e: iter(batches), epochs=2,
                callbacks=[Bomb(), Probe(), HistoryCallback(hist_path),
                           LossCurveCallback(str(tmp_path / "loss.png"))],
                log_fn=logs.append)
    assert calls == [0, 1, "end"]
    assert any("Bomb" in l for l in logs)
    assert os.path.exists(hist_path)
    assert os.path.exists(str(tmp_path / "loss.png"))


def test_memory_monitor_callback(monkeypatch):
    """Records per-epoch HBM peaks into trainer.history and warns when
    usage crosses the threshold fraction of the device limit (reference
    MemoryMonitorCallback, pytorch_lightning_modules.py:567-638)."""
    import types
    from vae_teb_tpu.train import MemoryMonitorCallback
    import vae_teb_tpu.utils.profiling as prof

    fake_stats = {"dev0": {"mb_in_use": 950.0, "peak_mb_in_use": 980.0,
                           "mb_limit": 1000.0},
                  "dev1": {"mb_in_use": 100.0, "peak_mb_in_use": 200.0,
                           "mb_limit": 1000.0},
                  "cpu": {}}
    monkeypatch.setattr(prof, "device_memory_stats", lambda: fake_stats)

    warnings = []
    cb = MemoryMonitorCallback(threshold_fraction=0.9, log_fn=warnings.append)
    trainer = types.SimpleNamespace(history={})
    cb.on_epoch_end(trainer, None, epoch=3)
    assert trainer.history["hbm_mb_in_use"] == [950.0]
    assert trainer.history["hbm_peak_mb"] == [980.0]
    assert len(warnings) == 1 and "dev0" in warnings[0]

    # below threshold: records, no warning
    fake_stats["dev0"]["mb_in_use"] = 500.0
    cb2 = MemoryMonitorCallback(threshold_fraction=0.9,
                                log_fn=warnings.append)
    cb2.on_epoch_end(trainer, None, epoch=4)
    assert len(warnings) == 1
    assert trainer.history["hbm_mb_in_use"] == [950.0, 500.0]

    # no devices reporting stats: a silent no-op
    monkeypatch.setattr(prof, "device_memory_stats", lambda: {"cpu": {}})
    cb2.on_epoch_end(trainer, None, epoch=5)
    assert len(trainer.history["hbm_mb_in_use"]) == 2


def test_adam_moment_dtype():
    """scale_by_adam_with_dtype: the fp32 path must be BIT-IDENTICAL to
    optax's stock adamw chain; the bf16-moments path must track it to
    rounding tolerance (the HBM-sweep optimization must not change the
    optimizer's math, only the at-rest moment precision)."""
    import optax
    from vae_teb_tpu.train.schedules import make_optimizer

    r = np.random.default_rng(0)
    params = {"a": jnp.asarray(r.standard_normal((64, 32)), jnp.float32),
              "b": jnp.asarray(r.standard_normal((7,)), jnp.float32)}
    tx_ref = make_optimizer(1e-3, 0.5, 1e-4)
    tx_f32 = make_optimizer(1e-3, 0.5, 1e-4, moment_dtype=jnp.float32)
    tx_b16 = make_optimizer(1e-3, 0.5, 1e-4, moment_dtype=jnp.bfloat16)

    def run(tx, n=5):
        s, p = tx.init(params), params
        for i in range(n):
            g = jax.tree.map(lambda x: jnp.sin(x * (i + 1)), p)
            u, s = tx.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p

    p_ref, p_f32, p_b16 = run(tx_ref), run(tx_f32), run(tx_b16)
    for k in params:
        np.testing.assert_array_equal(np.asarray(p_ref[k]),
                                      np.asarray(p_f32[k]))
        np.testing.assert_allclose(np.asarray(p_ref[k]),
                                   np.asarray(p_b16[k]), atol=5e-5)
    # moments actually stored in bf16 (unfused chain for introspection)
    s = make_optimizer(1e-3, 0.5, 1e-4, moment_dtype=jnp.bfloat16,
                       fuse_small_params=False).init(params)
    assert s[1][0].mu["a"].dtype == jnp.bfloat16
    assert s[1][0].nu["a"].dtype == jnp.bfloat16


def test_flat_param_fusion_matches_unfused():
    """flat_param_fusion packs every sub-threshold leaf into one flat fp32
    vector for the whole clip+AdamW chain. The packing must be semantics-
    preserving: updates equal the unfused chain's on every leaf (the clip
    norm is a global sum of squares, Adam/decay/LR are elementwise), big
    leaves keep their own state, and update dtypes survive the round trip."""
    import optax
    from vae_teb_tpu.train.schedules import flat_param_fusion, make_optimizer

    r = np.random.default_rng(1)
    params = {
        "head": jnp.asarray(r.standard_normal((256, 48)), jnp.float32),
        "deep": {"w": jnp.asarray(r.standard_normal((16, 16)), jnp.float32),
                 "b": jnp.asarray(r.standard_normal((5,)), jnp.float32)},
    }
    kw = dict(grad_clip_norm=0.5, weight_decay=1e-4,
              moment_dtype=jnp.bfloat16)
    tx_ref = make_optimizer(1e-3, fuse_small_params=False, **kw)
    # threshold between the big head (12288) and the small leaves
    tx_fused = flat_param_fusion(
        make_optimizer(1e-3, fuse_small_params=False, **kw), threshold=1000)

    def run(tx, n=5):
        s, p = tx.init(params), params
        for i in range(n):
            g = jax.tree.map(lambda x: jnp.sin(x * (i + 1)), p)
            u, s = tx.update(g, s, p)
            p = optax.apply_updates(p, u)
        return p, s

    p_ref, _ = run(tx_ref)
    p_fused, s_fused = run(tx_fused)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        assert a.dtype == b.dtype
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # state really is packed: one big leaf + one flat vector of the rest
    adam_state = s_fused[1][0]
    assert len(adam_state.mu["big"]) == 1
    assert adam_state.mu["flat"].shape == (16 * 16 + 5,)
    assert adam_state.mu["flat"].dtype == jnp.bfloat16


def test_beta_schedules():
    lin = beta_schedule("linear", 0.0, 1.0, anneal_epochs=10)
    assert lin(0) == 0.0 and lin(5) == 0.5 and lin(20) == 1.0
    cyc = beta_schedule("cyclic", 0.0, 1.0, cycle_len=4)
    assert cyc(0) == 0.0 and cyc(2) == 0.5 and cyc(4) == 0.0
    const = beta_schedule("constant", const_val=1e-5)
    assert const(123) == 1e-5
    with pytest.raises(ValueError):
        beta_schedule("bogus")(0)


def test_cosine_warm_restarts():
    sched = cosine_warm_restarts(1.0, t0_steps=100, eta_min_ratio=0.01)
    assert abs(float(sched(0)) - 1.0) < 1e-6
    mid = float(sched(50))
    assert 0.4 < mid < 0.6
    assert abs(float(sched(100)) - 1.0) < 1e-6  # warm restart


def test_transfer_params_vae_into_classifier(cpu_mesh_devices):
    from vae_teb_tpu.models import SeqVaeTebClassifier
    with jax.default_device(cpu_mesh_devices[0]):
        rng = jax.random.PRNGKey(0)
        vae = SeqVaeTeb()
        args = (jnp.ones((1, S, 43)), jnp.ones((1, S, 44)),
                jnp.ones((1, S, 130)))
        vae_vars = vae.init({"params": rng, "sample": rng}, *args,
                            train=False)
        cls = SeqVaeTebClassifier(classifier_depth=3, use_attention=False)
        cls_vars = cls.init({"params": jax.random.PRNGKey(1), "sample": rng,
                             "dropout": rng}, *args, train=False)
    new_params, copied = transfer_params(vae_vars["params"],
                                         cls_vars["params"],
                                         dst_prefix=("vae_model",))
    assert len(copied) > 50
    src_leaf = np.asarray(jax.tree.leaves(
        vae_vars["params"]["source_encoder"])[0])
    dst_leaf = np.asarray(jax.tree.leaves(
        new_params["vae_model"]["source_encoder"])[0])
    np.testing.assert_array_equal(src_leaf, dst_leaf)


def test_config_yaml_roundtrip(tmp_path):
    cfg = RunConfig(tag="t1")
    cfg.dataset.train_paths = ["a.h5"]
    cfg.trainer.lr = 0.01
    p = str(tmp_path / "cfg.yaml")
    save_config(cfg, p)
    loaded = load_config(p, root=str(tmp_path))
    assert loaded.trainer.lr == 0.01
    assert loaded.dataset.train_paths == [str(tmp_path / "a.h5")]
    d = loaded.run_dir(create=True)
    assert os.path.isdir(os.path.join(d, "model_checkpoints"))


def test_pallas_schedule_accepted_on_multi_device_mesh(cpu_mesh_devices):
    """lstm_schedule='wavefront_pallas' is multi-chip capable since round
    4: the batch-parallel kernels run per-shard under shard_map, so
    Trainer construction must accept >1-device meshes (grad parity on the
    sharded case: test_models.test_lstm_wavefront_pallas_sharded_grads;
    full-model multi-device step: __graft_entry__._dryrun_body)."""
    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    model = SeqVaeTeb(lstm_schedule="wavefront_pallas")
    Trainer(model, TrainerConfig(), mesh=mesh)
    single = data_parallel_mesh(devices=cpu_mesh_devices[:1])
    Trainer(model, TrainerConfig(), mesh=single)


def test_steps_per_execution_parity(cpu_mesh_devices):
    """K stacked steps in ONE dispatch (train_multi_step's on-device
    lax.scan) must equal K sequential train_step calls exactly — same
    final params/opt_state/rng and per-step metrics (round-5 loop-
    dispatch amortization, BASELINE.md loop attribution)."""
    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    cfg = TrainerConfig(lr=1e-3, seed=7)
    trainer = Trainer(MiniVae(), cfg, mesh=mesh)
    rng = np.random.default_rng(11)
    batches = [make_batch(rng) for _ in range(3)]
    state0 = trainer.init_state(batches[0])

    # sequential reference
    state_seq = state0
    seq_metrics = []
    for b in batches:
        state_seq, m = trainer.train_step(state_seq, b, beta=1e-5)
        seq_metrics.append({k: float(v) for k, v in m.items()})

    # one stacked dispatch
    from vae_teb_tpu.train.trainer import _stack_batches
    (stacked,) = list(_stack_batches(iter(batches), 3))
    state_multi, ms = trainer.train_multi_step(state0, stacked, beta=1e-5)

    assert int(state_multi.step) == int(state_seq.step) == int(state0.step) + 3
    for k, v in ms.items():
        v = np.asarray(v)
        assert v.shape == (3,), k
        for i in range(3):
            np.testing.assert_allclose(v[i], seq_metrics[i][k], rtol=1e-5,
                                       atol=1e-6, err_msg=k)
    for pa, pb in zip(jax.tree.leaves(jax.device_get(state_seq.params)),
                      jax.tree.leaves(jax.device_get(state_multi.params))):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(state_seq.rng),
                                  np.asarray(state_multi.rng))


def test_fit_loop_steps_per_execution(cpu_mesh_devices):
    """fit with steps_per_execution=2 over 5 batches (2 full stacks + a
    ragged tail of 1) must see every window, produce per-step metric
    history, and match the spe=1 fit's final params exactly."""
    mesh = data_parallel_mesh(devices=cpu_mesh_devices)
    rng = np.random.default_rng(13)
    batches = [make_batch(rng) for _ in range(5)]

    def run(spe):
        cfg = TrainerConfig(lr=1e-3, epochs=1, seed=3,
                            steps_per_execution=spe, prefetch=2)
        trainer = Trainer(MiniVae(), cfg, mesh=mesh)
        state = trainer.init_state(batches[0])
        state = trainer.fit(state, lambda e: iter(batches))
        return trainer, state

    tr1, st1 = run(1)
    tr2, st2 = run(2)
    assert int(st2.step) == 5
    # loop accounting saw every window in both modes
    assert tr1.history["windows_per_sec"][0] > 0
    assert tr2.history["windows_per_sec"][0] > 0
    np.testing.assert_allclose(tr1.history["train/total_loss"],
                               tr2.history["train/total_loss"],
                               rtol=1e-5, atol=1e-6)
    for pa, pb in zip(jax.tree.leaves(jax.device_get(st1.params)),
                      jax.tree.leaves(jax.device_get(st2.params))):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-6, atol=1e-7)
