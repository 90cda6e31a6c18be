"""Tiny-geometry smoke + semantics tests for the GAN / CausVid /
ODE-regression / causal-diffusion objectives and their trainers
(reference model/{gan,causvid,ode_regression,diffusion}.py,
trainer/{gan,ode,diffusion}.py)."""
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WAN_TINY
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.scheduler import FlowMatchScheduler
from self_forcing_tpu.training.objectives import (causal_diffusion, causvid,
                                                  gan as gan_obj,
                                                  ode_regression)
from self_forcing_tpu.training.objectives.base import (ModelBundle,
                                                       ObjectiveConfig)

B, F, C, H, W = 1, 4, 16, 8, 8
NB = 2


def _cfg_args(**kw):
    d = dict(num_train_timestep=1000, timestep_shift=5.0,
             num_frame_per_block=NB, denoising_step_list=[1000, 500],
             lr=1e-4, seed=0, num_training_frames=F, num_class=1,
             warp_denoising_step=False)
    d.update(kw)
    return types.SimpleNamespace(**d)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    gen = dit.init_params(key, WAN_TINY, dtype=jnp.float32)
    fake = dit.init_params(jax.random.fold_in(key, 1), WAN_TINY,
                           dtype=jnp.float32, causal=False)
    cls = dit.init_cls_branch_params(jax.random.fold_in(key, 2), WAN_TINY)
    ctx = jax.random.normal(jax.random.fold_in(key, 3),
                            (B, 8, WAN_TINY.text_dim), jnp.float32)
    clean = jax.random.normal(jax.random.fold_in(key, 4), (B, F, C, H, W))
    obj = ObjectiveConfig(num_frame_per_block=NB, num_training_frames=F,
                          timestep_shift=5.0)
    bundle = ModelBundle.create(
        WAN_TINY.__class__(**{**WAN_TINY.__dict__,
                              "num_frame_per_block": NB}),
        WAN_TINY, WAN_TINY, obj, [1000, 500])
    return gen, fake, cls, ctx, clean, obj, bundle


def test_forward_classify_shapes(setup):
    gen, fake, cls, ctx, clean, obj, bundle = setup
    t = jnp.full((B, F), 500.0)
    flow, logits = dit.forward_classify(fake, cls, WAN_TINY, clean, t, ctx,
                                        bundle.rope_c)
    assert flow.shape == (B, F, C, H, W)
    assert logits.shape == (B, 1)
    assert np.isfinite(np.asarray(logits)).all()


def test_forward_classify_time_embed(setup):
    gen, fake, cls, ctx, clean, obj, bundle = setup
    cls_te = dit.init_cls_branch_params(
        jax.random.PRNGKey(9), WAN_TINY, num_class=4,
        time_embed_dim=WAN_TINY.dim)
    t = jnp.full((B, F), 500.0)
    _, logits = dit.forward_classify(fake, cls_te, WAN_TINY, clean, t, ctx,
                                     bundle.rope_c,
                                     concat_time_embeddings=True)
    assert logits.shape == (B, 4)


@pytest.mark.slow
def test_gan_losses(setup):
    gen, fake, cls, ctx, clean, obj, bundle = setup
    noise = jax.random.normal(jax.random.PRNGKey(5), (B, F, C, H, W))
    g_loss, glog = gan_obj.generator_loss(
        bundle, obj, gen, fake, cls, noise, clean, ctx, None, 0,
        jax.random.PRNGKey(6))
    d_loss, dlog = gan_obj.critic_loss(
        bundle, obj, gen, fake, cls, noise, clean, ctx, None, 0,
        jax.random.PRNGKey(7), r1_weight=0.1, r2_weight=0.1)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    assert float(dlog["r1_loss"]) >= 0 and float(dlog["r2_loss"]) >= 0


def test_gan_generator_grad_skips_discriminator(setup):
    """Generator step must not produce gradient w.r.t. the (stop-gradient)
    discriminator params."""
    gen, fake, cls, ctx, clean, obj, bundle = setup
    noise = jax.random.normal(jax.random.PRNGKey(8), (B, F, C, H, W))

    def loss_wrt_fake(f):
        loss, _ = gan_obj.generator_loss(
            bundle, obj, gen, f, cls, noise, clean, ctx, None, 0,
            jax.random.PRNGKey(6))
        return loss

    g = jax.grad(loss_wrt_fake)(fake)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert total == 0.0


def test_causvid_losses(setup):
    gen, fake, cls, ctx, clean, obj, bundle = setup
    real = dit.init_params(jax.random.PRNGKey(11), WAN_TINY,
                           dtype=jnp.float32, causal=False)
    g_loss, _ = causvid.generator_loss(
        bundle, obj, gen, fake, real, clean, ctx, jnp.zeros_like(ctx),
        jax.random.PRNGKey(12))
    c_loss, _ = causvid.critic_loss(
        bundle, obj, gen, fake, clean, ctx, None, jax.random.PRNGKey(13))
    assert np.isfinite(float(g_loss)) and np.isfinite(float(c_loss))
    # teacher forcing variant
    g2, _ = causvid.generator_loss(
        bundle, obj, gen, fake, real, clean, ctx, jnp.zeros_like(ctx),
        jax.random.PRNGKey(12), teacher_forcing=True)
    assert np.isfinite(float(g2))


def test_ode_regression_loss(setup):
    gen, fake, cls, ctx, clean, obj, bundle = setup
    T = 2  # len(denoising_step_list)
    ode = jax.random.normal(jax.random.PRNGKey(14), (B, T, F, C, H, W))
    sched = FlowMatchScheduler.create(1000, shift=5.0, training=True)
    loss, log = ode_regression.generator_loss(
        gen, WAN_TINY.__class__(**{**WAN_TINY.__dict__,
                                   "num_frame_per_block": NB}),
        bundle.rope_g, sched, ode, ctx, (1000.0, 500.0), NB,
        jax.random.PRNGKey(15))
    assert np.isfinite(float(loss))
    assert log["timestep"].shape == (B,)


def test_causal_diffusion_loss(setup):
    gen, fake, cls, ctx, clean, obj, bundle = setup
    sched = FlowMatchScheduler.create(1000, shift=5.0, training=True)
    for tf in (False, True):
        loss, log = causal_diffusion.generator_loss(
            gen, WAN_TINY, bundle.rope_g, sched, clean, ctx, NB,
            jax.random.PRNGKey(16), teacher_forcing=tf,
            noise_augmentation_max_timestep=100 if tf else 0)
        assert np.isfinite(float(loss)), f"tf={tf}"


@pytest.mark.slow
def test_trainers_one_step(setup):
    gen, fake, cls, ctx, clean, obj, bundle = setup
    from self_forcing_tpu.training.trainer_ode import ODETrainer
    from self_forcing_tpu.training.trainer_diffusion import DiffusionTrainer
    from self_forcing_tpu.training.trainer_gan import GANTrainer

    t1 = ODETrainer(_cfg_args(), gen, WAN_TINY)
    ode = jax.random.normal(jax.random.PRNGKey(17), (B, 2, F, C, H, W))
    log1 = t1.train_step({"ode_latent": ode, "context": ctx})
    assert np.isfinite(log1["loss"])

    t2 = DiffusionTrainer(_cfg_args(), gen, WAN_TINY)
    log2 = t2.train_step({"latents": clean, "context": ctx})
    assert np.isfinite(log2["loss"])

    t3 = GANTrainer(_cfg_args(discriminator_warmup_steps=0,
                              r1_weight=0.01, r2_weight=0.01),
                    gen, fake, WAN_TINY, WAN_TINY, cls_params=cls)
    log3 = t3.train_step({"latents": clean, "context": ctx})
    assert np.isfinite(log3["critic_loss"])
    assert np.isfinite(log3["generator_loss"])


@pytest.mark.slow
def test_sid_losses(setup):
    """SiD objective (model/sid.py): generator + critic losses finite and
    alpha changes the loss."""
    import copy
    from self_forcing_tpu.training.objectives import sid
    gen, fake, cls, ctx, clean, obj, bundle = setup
    noise = jax.random.normal(jax.random.PRNGKey(21), (B, F, C, H, W))
    real = dit.init_params(jax.random.PRNGKey(22), WAN_TINY,
                           dtype=jnp.float32, causal=False)
    # zero-init output heads make s_real == s_fake == identity -> give the
    # score models distinct random heads so the loss is non-degenerate
    fake = copy.deepcopy(fake)
    for p, k in ((fake, 30), (real, 31)):
        h = dict(p["head"]["head"])
        h["w"] = jax.random.normal(jax.random.PRNGKey(k), h["w"].shape) * 0.02
        p["head"]["head"] = h
    g_loss, glog = sid.generator_loss(
        bundle, obj, gen, fake, real, noise, ctx, jnp.zeros_like(ctx), 0,
        jax.random.PRNGKey(23))
    assert np.isfinite(float(g_loss))

    import dataclasses as dc
    obj2 = dc.replace(obj, sid_alpha=0.0)
    g2, _ = sid.generator_loss(
        bundle, obj2, gen, fake, real, noise, ctx, jnp.zeros_like(ctx), 0,
        jax.random.PRNGKey(23))
    assert float(g_loss) != float(g2)


@pytest.mark.slow
def test_trim_rollout_long_reencode():
    """Long-rollout handling (model/base.py:211-233): >21-frame rollouts
    slice to the last 21 with a VAE re-encoded boundary image latent and a
    first-block gradient mask; <=21 passes through untouched."""
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    from self_forcing_tpu.models.wan import vae as vae_mod
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.training.objectives.base import (ModelBundle,
                                                           ObjectiveConfig)

    cfg = dc.replace(WAN_TINY, num_frame_per_block=3)
    obj = ObjectiveConfig(num_frame_per_block=3, num_training_frames=24)
    vae_cfg = vae_mod.VAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 2, 2))
    vae_params = vae_mod.init_params(jax.random.PRNGKey(0), vae_cfg)
    bundle = ModelBundle.create(cfg, cfg, cfg, obj, [1000, 500],
                                vae_params=vae_params, vae_cfg=vae_cfg)

    short = jax.random.normal(jax.random.PRNGKey(1), (1, 21, 16, 8, 8))
    out, mask = bundle.trim_rollout(short)
    assert out is short and mask is None

    pred = jax.random.normal(jax.random.PRNGKey(2), (1, 24, 16, 8, 8))
    out, mask = bundle.trim_rollout(pred)
    assert out.shape == (1, 21, 16, 8, 8)
    # tail 20 frames pass through; boundary frame is the re-encoded one
    np.testing.assert_array_equal(np.asarray(out[:, 1:]),
                                  np.asarray(pred[:, -20:]))
    assert not bool(jnp.all(out[:, :1] == pred[:, 3:4]))
    assert mask.shape == out.shape
    assert not bool(mask[:, :3].any()) and bool(mask[:, 3:].all())
    # the re-encoded boundary frame carries no gradient
    g = jax.grad(lambda p: float(jnp.sum(bundle.trim_rollout(p)[0] ** 2))
                 if False else jnp.sum(bundle.trim_rollout(p)[0][:, :1] ** 2)
                 )(pred)
    assert float(jnp.abs(g).max()) == 0.0


def test_bundle_without_vae_rejects_long_rollout():
    import dataclasses as dc
    import jax
    import pytest
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.training.objectives.base import (ModelBundle,
                                                           ObjectiveConfig)
    cfg = dc.replace(WAN_TINY, num_frame_per_block=3)
    obj = ObjectiveConfig(num_frame_per_block=3, num_training_frames=24)
    bundle = ModelBundle.create(cfg, cfg, cfg, obj, [1000, 500])
    pred = jax.numpy.zeros((1, 24, 16, 8, 8))
    with pytest.raises(ValueError, match="VAE"):
        bundle.trim_rollout(pred)


@pytest.mark.slow
def test_per_block_exit_matches_shared_when_equal():
    """same_step_across_blocks=False (per-block exit array) must reduce to
    the shared-exit rollout when every block draws the same exit
    (reference self_forcing_training.py:136-149)."""
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.models.wan.rope import RopeTables
    from self_forcing_tpu.pipelines.self_forcing_training import (
        SelfForcingTrainingPipeline)
    from self_forcing_tpu.scheduler import FlowMatchScheduler

    cfg = dc.replace(WAN_TINY, num_frame_per_block=2)
    params = dit.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rope = RopeTables.create(cfg.head_dim)
    sched = FlowMatchScheduler.create(1000, shift=5.0, training=True)
    pipe = SelfForcingTrainingPipeline(
        [1000, 500], sched, num_frame_per_block=2, num_max_frames=4,
        same_step_across_blocks=False, frame_seqlen=16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.text_dim))
    ctx_kv = dit.precompute_context(params, cfg, ctx)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16, 8, 8))
    rng = jax.random.PRNGKey(3)

    for e in (0, 1):
        ref, tf, tt = pipe.inference_with_trajectory(
            params, cfg, rope, noise, ctx_kv, e, rng)
        out, tf2, tt2 = pipe.inference_with_trajectory(
            params, cfg, rope, noise, ctx_kv,
            np.asarray([e, e], np.int32), rng)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        assert (tf2, tt2) == (None, None)

    # mixed exits differ from either shared rollout
    mixed, _, _ = pipe.inference_with_trajectory(
        params, cfg, rope, noise, ctx_kv, np.asarray([0, 1], np.int32), rng)
    ref0, _, _ = pipe.inference_with_trajectory(
        params, cfg, rope, noise, ctx_kv, 0, rng)
    assert float(jnp.abs(mixed - ref0).max()) > 1e-4


def test_gan_trainer_resume_flags(setup, tmp_path):
    """GAN resume extras (reference trainer/gan.py:181-197, whose own
    checkpointer is never constructed): force_start_w_ema swaps the EMA
    weights into the live generator, force_reset_zero_step replays the
    warmup phases from step 0."""
    from self_forcing_tpu.training.trainer_gan import GANTrainer
    gen, fake, cls, ctx, clean, obj, bundle = setup
    t = GANTrainer(_cfg_args(discriminator_warmup_steps=0,
                             ema_weight=0.9),
                   gen, fake, WAN_TINY, WAN_TINY, cls_params=cls)
    # EMA is lazily initialized by train_step; init it directly and make
    # it distinct from the live generator
    from self_forcing_tpu.training import ema as ema_lib
    t.generator_ema = jax.tree.map(lambda e: e + 1.0,
                                   ema_lib.init_ema(t.generator))
    t.step = 7
    p = str(tmp_path / "gan_ckpt")
    t.save_state(p)

    t2 = GANTrainer(_cfg_args(discriminator_warmup_steps=0,
                              ema_weight=0.9),
                    gen, fake, WAN_TINY, WAN_TINY, cls_params=cls)
    t2.load_state(p)
    assert t2.step == 7

    t3 = GANTrainer(_cfg_args(discriminator_warmup_steps=0,
                              ema_weight=0.9),
                    gen, fake, WAN_TINY, WAN_TINY, cls_params=cls)
    t3.load_state(p, force_start_w_ema=True, force_reset_zero_step=True)
    assert t3.step == 0
    a = jax.tree.leaves(t3.generator)[0]
    b = jax.tree.leaves(t2.generator)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b) + 1.0,
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_ode_diffusion_trainers_sharded_step(setup):
    """ODE + diffusion trainers with mesh= (round-4 FSDP wiring,
    reference trainer/ode.py:63-74 / trainer/diffusion.py:58-69): one
    sharded step each on the 8-device CPU mesh with finite loss and a
    nonzero grad norm, params staying FSDP-sharded through the update."""
    from self_forcing_tpu.parallel.mesh import create_mesh
    from self_forcing_tpu.training.trainer_diffusion import DiffusionTrainer
    from self_forcing_tpu.training.trainer_ode import ODETrainer

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    gen, fake, cls, ctx, clean, obj, bundle = setup
    mesh = create_mesh(dp=2, fsdp=len(jax.devices()) // 2)
    B2 = 2  # divisible by dp for the data split
    ctx2 = jnp.broadcast_to(ctx, (B2,) + ctx.shape[1:])
    clean2 = jnp.broadcast_to(clean, (B2,) + clean.shape[1:])
    ode2 = jax.random.normal(jax.random.PRNGKey(31), (B2, 2, F, C, H, W))

    t1 = ODETrainer(_cfg_args(), gen, WAN_TINY, visualize=False, mesh=mesh)
    log1 = t1.train_step({"ode_latent": ode2, "context": ctx2})
    assert np.isfinite(log1["loss"]) and log1["grad_norm"] > 0, log1
    sharded = [x for x in jax.tree.leaves(t1.params)
               if not x.sharding.is_fully_replicated]
    assert sharded, "no ODE param leaf is FSDP-sharded"

    t2 = DiffusionTrainer(_cfg_args(), gen, WAN_TINY, mesh=mesh)
    log2 = t2.train_step({"latents": clean2, "context": ctx2})
    assert np.isfinite(log2["loss"]) and log2["grad_norm"] > 0, log2
    sharded = [x for x in jax.tree.leaves(t2.params)
               if not x.sharding.is_fully_replicated]
    assert sharded, "no diffusion param leaf is FSDP-sharded"


@pytest.mark.slow
def test_dmd_step_with_wider_sp_teacher(setup):
    """14B-teacher path (SURVEY §2.8 stretch goal): a DMD step whose
    frozen real_score is WIDER than the student and runs sequence-
    parallel over an ('sp',) axis (ring attention, fsdp GSPMD-auto —
    parallel/sequence.py via ModelBundle.teacher_sp_mesh; reference
    xdit USP teacher, wan/distributed/xdit_context_parallel.py:66-184).
    Grads finite and nonzero through the sp-sharded teacher forwards."""
    import dataclasses

    from self_forcing_tpu.parallel.mesh import create_mesh, shard_params
    from self_forcing_tpu.training.trainer_distillation import (
        ScoreDistillationTrainer)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    gen, fake, cls, ctx, clean, obj, bundle = setup
    mesh = create_mesh(dp=1, fsdp=2, sp=4)
    teacher_cfg = dataclasses.replace(
        WAN_TINY, dim=256, ffn_dim=512, num_heads=4)
    real_wide = dit.init_params(jax.random.PRNGKey(41), teacher_cfg,
                                dtype=jnp.float32, causal=False)
    real_wide["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(42), real_wide["head"]["head"]["w"].shape)
    gen_s = shard_params(gen, mesh, min_size=1024)
    fake_s = shard_params(fake, mesh, min_size=1024)
    real_s = shard_params(real_wide, mesh, min_size=1024)
    cfg_args = _cfg_args(num_train_timestep=1000, guidance_scale=3.0,
                         dfake_gen_update_ratio=1, ema_weight=0.0,
                         context_noise=0, seed=0,
                         image_or_video_shape=[1, F, C, H, W],
                         denoising_loss_type="flow",
                         independent_first_frame=False,
                         same_step_across_blocks=True, ts_schedule=False)
    trainer = ScoreDistillationTrainer(cfg_args, gen_s, fake_s, real_s,
                                       WAN_TINY, WAN_TINY, teacher_cfg,
                                       ctx, mesh=mesh)
    assert trainer.bundle.teacher_sp_mesh is mesh
    log = trainer.train_step({"context": ctx})
    assert np.isfinite(log["generator_loss"]), log
    assert log["generator_grad_norm"] > 0, log
    assert np.isfinite(log["critic_loss"]), log


@pytest.mark.slow
def test_sharded_orbax_save_restore_roundtrip(setup, tmp_path):
    """orbax save->restore round-trip on FSDP-SHARDED trainer state
    (VERDICT r3 next #3: resume must work on a mesh, not just
    single-device; reference utils/distributed.py:11-20 FSDP +
    trainer/distillation.py checkpointing).  Restored leaves must carry
    the same values AND stay sharded (StandardCheckpointer restores to
    the sharding of the `like` tree, trainer_distillation.py:386-402)."""
    from self_forcing_tpu.parallel.mesh import create_mesh, shard_params
    from self_forcing_tpu.training.trainer_distillation import (
        ScoreDistillationTrainer)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    gen, fake, cls, ctx, clean, obj, bundle = setup
    mesh = create_mesh(dp=2, fsdp=4)
    real = dit.init_params(jax.random.PRNGKey(51), WAN_TINY,
                           dtype=jnp.float32, causal=False)
    cfg_args = _cfg_args(guidance_scale=3.0, dfake_gen_update_ratio=1,
                         ema_weight=0.0, context_noise=0,
                         image_or_video_shape=[1, F, C, H, W],
                         denoising_loss_type="flow",
                         independent_first_frame=False,
                         same_step_across_blocks=True, ts_schedule=False)

    def make():
        return ScoreDistillationTrainer(
            cfg_args, shard_params(gen, mesh, min_size=1024),
            shard_params(fake, mesh, min_size=1024),
            shard_params(real, mesh, min_size=1024),
            WAN_TINY, WAN_TINY, WAN_TINY, ctx, mesh=mesh)

    tr = make()
    sharded_before = [x for x in jax.tree.leaves(tr.state.generator)
                      if not x.sharding.is_fully_replicated]
    assert sharded_before, "fixture params not actually FSDP-sharded"
    tr.state.step = 7
    path = str(tmp_path / "sharded_ckpt")
    tr.save_state(path)

    tr2 = make()
    # clobber so a silent no-op restore can't pass
    tr2.state.generator = jax.tree.map(jnp.zeros_like, tr2.state.generator)
    tr2.load_state(path)
    assert tr2.state.step == 7
    restored = jax.tree.leaves(tr2.state.generator)
    original = jax.tree.leaves(tr.state.generator)
    for a, b in zip(original, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(not x.sharding.is_fully_replicated for x in restored), \
        "restore dropped the FSDP shardings"
