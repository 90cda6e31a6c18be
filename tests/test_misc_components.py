"""Coverage for aux components: prompt extension fallback, trainer
full-state resume, metrics logger, misc utils, memory/profiling helpers."""
import os
import types

import numpy as np
import jax
import jax.numpy as jnp

from self_forcing_tpu.prompt_extend import (PromptOutput, QwenPromptExpander,
                                            template_extend)


def test_prompt_extend_fallback():
    out = template_extend("a cat runs")
    assert out.status and "a cat runs" in out.prompt
    assert len(out.prompt) > len("a cat runs")
    # Qwen expander degrades gracefully without weights/network
    exp = QwenPromptExpander(model_name="/nonexistent/model")
    out2 = exp("a dog", tar_lang="en")
    assert out2.status and "a dog" in out2.prompt


def test_trainer_save_load_state(tmp_path):
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.training.trainer_distillation import (
        ScoreDistillationTrainer)

    cfg_args = types.SimpleNamespace(
        num_train_timestep=1000, timestep_shift=5.0, num_frame_per_block=2,
        denoising_step_list=[1000, 500], lr=1e-4, seed=0,
        num_training_frames=4, warp_denoising_step=False,
        last_step_only=True, dfake_gen_update_ratio=1, ema_weight=0.0,
        image_or_video_shape=[1, 4, 16, 8, 8])
    key = jax.random.PRNGKey(0)
    gen = dit.init_params(key, WAN_TINY, jnp.float32)
    fake = dit.init_params(jax.random.fold_in(key, 1), WAN_TINY,
                           jnp.float32, causal=False)
    real = dit.init_params(jax.random.fold_in(key, 2), WAN_TINY,
                           jnp.float32, causal=False)
    ctx = jax.random.normal(jax.random.fold_in(key, 3),
                            (1, 8, WAN_TINY.text_dim))
    tr = ScoreDistillationTrainer(cfg_args, gen, fake, real, WAN_TINY,
                                  WAN_TINY, WAN_TINY, jnp.zeros_like(ctx))
    tr.state.step = 7
    path = str(tmp_path / "ckpt")
    tr.save_state(path)

    tr2 = ScoreDistillationTrainer(cfg_args, gen, fake, real, WAN_TINY,
                                   WAN_TINY, WAN_TINY, jnp.zeros_like(ctx))
    tr2.load_state(path)
    assert tr2.state.step == 7
    a = jax.tree.leaves(tr.state.generator)[0]
    b = jax.tree.leaves(tr2.state.generator)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metrics_logger(tmp_path):
    from self_forcing_tpu.utils.metrics import MetricsLogger
    lg = MetricsLogger(str(tmp_path), disable_wandb=True)
    lg.log({"loss": 1.5, "note": "x"}, step=3)
    lg.close()
    import json
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().splitlines()[0])
    assert rec["loss"] == 1.5 and rec["step"] == 3


def test_misc_utils():
    from self_forcing_tpu.utils.misc import merge_dict_list, set_seed
    set_seed(3)
    merged = merge_dict_list([{"a": 1.0, "b": np.ones(2)},
                              {"a": 3.0, "b": np.zeros(2)}])
    assert merged["a"] == 2.0
    assert merged["b"].shape == (2, 2)


def test_memory_helpers():
    from self_forcing_tpu.utils.memory import get_hbm_stats, move_to_device
    stats = get_hbm_stats()
    assert set(stats) == {"bytes_in_use", "bytes_limit",
                          "peak_bytes_in_use"}
    tree = move_to_device({"x": np.ones(3)})
    assert jnp.asarray(tree["x"]).sum() == 3


def test_phase_timer():
    from self_forcing_tpu.utils.profiling import PhaseTimer
    t = PhaseTimer()
    with t.phase("init"):
        pass
    t.add_block_time(0.01)
    rep = t.report()
    assert "init" in rep and "Block 0" in rep


def test_video_io_roundtrip(tmp_path):
    from self_forcing_tpu.utils.video_io import load_video, save_video
    frames = (np.random.default_rng(0).integers(
        0, 255, (5, 32, 48, 3))).astype(np.uint8)
    p = str(tmp_path / "v.mp4")
    save_video(frames, p, fps=8)
    back = load_video(p)
    assert back.shape == frames.shape


def test_wan_t2v_generate_tiny():
    """WanT2V quality-path facade (reference wan/text2video.py:110-266)."""
    from self_forcing_tpu.models.wan import dit, vae as vae_mod
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.wan_generate import WanT2V

    params = dit.init_params(jax.random.PRNGKey(0), WAN_TINY, jnp.float32)
    vae_cfg = vae_mod.VAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 2, 2),
                                num_res_blocks=1)
    vae_params = vae_mod.init_params(jax.random.PRNGKey(1), vae_cfg)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, WAN_TINY.text_dim))
    t2v = WanT2V(params, WAN_TINY, vae_params=vae_params, vae_cfg=vae_cfg)
    video = t2v.generate("a cat", size=(64, 64), frame_num=5,
                         sampling_steps=2, guide_scale=2.0, seed=1,
                         context=ctx, neg_context=jnp.zeros_like(ctx))
    assert video.shape == (5, 3, 64, 64)
    assert np.isfinite(np.asarray(video)).all()


def test_ode_trainer_resume(tmp_path):
    import types
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.training.trainer_ode import ODETrainer
    args = types.SimpleNamespace(
        num_train_timestep=1000, timestep_shift=5.0, num_frame_per_block=2,
        denoising_step_list=[1000, 500], lr=1e-4, seed=0,
        warp_denoising_step=False, ema_weight=0.0)
    gen = dit.init_params(jax.random.PRNGKey(0), WAN_TINY, jnp.float32)
    t = ODETrainer(args, gen, WAN_TINY)
    t.step = 5
    p = str(tmp_path / "ode_ckpt")
    t.save_state(p)
    t2 = ODETrainer(args, gen, WAN_TINY)
    t2.load_state(p)
    assert t2.step == 5


def test_config_merge_semantics(tmp_path):
    """Experiment config wins over default; nested dicts merge
    (reference OmegaConf.merge order, train.py:20-22)."""
    from self_forcing_tpu.config import load_config
    (tmp_path / "default.yaml").write_text(
        "a: 1\nb: {x: 1, y: 2}\nonly_default: 7\n")
    (tmp_path / "exp.yaml").write_text(
        "a: 5\nb: {x: 9}\nonly_exp: 3\n")
    c = load_config(str(tmp_path / "exp.yaml"),
                    str(tmp_path / "default.yaml"))
    assert c.a == 5              # experiment wins
    assert c.b.x == 9 and c.b.y == 2  # nested merge
    assert c.only_default == 7 and c.only_exp == 3


def test_quantized_pipeline_inference():
    """int8 weight-only params run through the full few-step pipeline
    (demo.py --quantize path)."""
    import types
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.ops.quant import quantize_dit_params
    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline)
    args = types.SimpleNamespace(
        denoising_step_list=[1000, 500], warp_denoising_step=False,
        num_frame_per_block=2, independent_first_frame=False,
        context_noise=0, timestep_shift=8.0)
    params = quantize_dit_params(
        dit.init_params(jax.random.PRNGKey(0), WAN_TINY, jnp.float32),
        min_dim=64)
    pipe = CausalInferencePipeline(args, params, WAN_TINY)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, WAN_TINY.text_dim))
    _, lat = pipe.inference(noise, context=ctx, return_latents=True)
    assert lat.shape == noise.shape
    assert np.isfinite(np.asarray(lat)).all()


def test_quantized_qkv_fusion_exact():
    """fuse_qkv=True merges the q/k/v projections into one matmul with
    per-channel scales preserved — the pipeline output must match the
    three-matmul quantized path to float rounding."""
    import types
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.ops.quant import quantize_dit_params
    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline)
    args = types.SimpleNamespace(
        denoising_step_list=[1000, 500], warp_denoising_step=False,
        num_frame_per_block=2, independent_first_frame=False,
        context_noise=0, timestep_shift=8.0)
    params = dit.init_params(jax.random.PRNGKey(0), WAN_TINY, jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, WAN_TINY.text_dim))
    lats = []
    for fuse in (False, True):
        qp = quantize_dit_params(params, min_dim=64, fuse_qkv=fuse)
        sa = qp["blocks"]["self_attn"]
        assert ("qkv" in sa) == fuse
        assert ("q" in sa) == (not fuse)
        pipe = CausalInferencePipeline(args, qp, WAN_TINY)
        _, lat = pipe.inference(noise, context=ctx, return_latents=True)
        lats.append(np.asarray(lat))
    np.testing.assert_allclose(lats[0], lats[1], rtol=2e-5, atol=2e-5)


def test_runtime_find_recursive(tmp_path):
    """'**/' patterns must recurse (deep checkpoint layouts resolved to
    None before recursive=True)."""
    from self_forcing_tpu.runtime import _find
    deep = tmp_path / "a" / "b"
    deep.mkdir(parents=True)
    (deep / "model.pth").write_bytes(b"x")
    assert _find(str(tmp_path), "**/model.pth") is not None
    assert _find(str(tmp_path), "nope/*.pth") is None


def test_chip_registry_defaults():
    """ops/chip.py: device_kind-keyed kernel defaults (the reference's
    FA3-on-Hopper hardware dispatch analog, wan/modules/attention.py:
    4-20); v5e keeps the measured int8qk demo attention (no behavior
    change), v6e projects full-int8."""
    from self_forcing_tpu.ops import chip
    try:
        chip.set_chip_override("TPU v5 lite")
        assert chip.chip_defaults() == {
            "attn_softmax": "free", "demo_attn_quant": "int8qk",
            "matmul_quant": "w8a8"}
        chip.set_chip_override("TPU v6e")
        assert chip.chip_defaults()["demo_attn_quant"] == "int8"
        chip.set_chip_override("TPU v6 lite")
        assert chip.chip_defaults()["demo_attn_quant"] == "int8"
        chip.set_chip_override("TPU v5p")
        assert chip.chip_defaults()["demo_attn_quant"] == "int8qk"
        # unknown chip -> safe fallback
        chip.set_chip_override("cpu")
        assert chip.chip_defaults()["demo_attn_quant"] == "int8qk"
        # explicit kind wins over the override
        assert chip.chip_defaults("TPU v6e")["demo_attn_quant"] == "int8"
    finally:
        chip.set_chip_override(None)
