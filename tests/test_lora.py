"""LoRA system tests (reference utils/lora.py, scripts/merge_lora.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from self_forcing_tpu import lora
from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WAN_TINY
from self_forcing_tpu.models.wan.rope import RopeTables

B, F, C, H, W = 1, 2, 16, 8, 8


def _randomize_head(params):
    """The output head is zero-init (model.py:923) — give it weights so
    forward outputs are sensitive to upstream changes."""
    import copy
    params = copy.deepcopy(params)
    h = dict(params["head"]["head"])
    h["w"] = jax.random.normal(jax.random.PRNGKey(42), h["w"].shape,
                               h["w"].dtype) * 0.02
    params["head"]["head"] = h
    return params


def _forward(params):
    rope = RopeTables.create(WAN_TINY.head_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, F, C, H, W))
    t = jnp.full((B, F), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 8, WAN_TINY.text_dim))
    return dit.forward_train(params, WAN_TINY, x, t, ctx, None, rope,
                             remat=False)


def test_apply_lora_identity_at_init():
    params = _randomize_head(dit.init_params(jax.random.PRNGKey(0), WAN_TINY,
                                             dtype=jnp.float32))
    base = _forward(params)
    lp = lora.apply_lora(params, rank=4, alpha=8.0)
    assert "lora_A" in lp["blocks"]["self_attn"]["q"]
    out = _forward(lp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


def test_lora_changes_output_and_merges():
    params = _randomize_head(dit.init_params(jax.random.PRNGKey(0), WAN_TINY,
                                             dtype=jnp.float32))
    lp = lora.apply_lora(params, rank=4, alpha=8.0)
    # give B nonzero values so the adapter does something
    q = dict(lp["blocks"]["self_attn"]["q"])
    q["lora_B"] = jnp.ones_like(q["lora_B"]) * 0.01
    lp["blocks"]["self_attn"]["q"] = q
    out_lora = _forward(lp)
    base = _forward(params)
    assert float(jnp.abs(out_lora - base).max()) > 1e-6

    merged = lora.merge_lora(lp)
    assert "lora_A" not in merged["blocks"]["self_attn"]["q"]
    out_merged = _forward(merged)
    np.testing.assert_allclose(np.asarray(out_merged), np.asarray(out_lora),
                               rtol=1e-4, atol=1e-5)


def test_load_lora_weights_torch_formats():
    params = dit.init_params(jax.random.PRNGKey(0), WAN_TINY,
                             dtype=jnp.float32)
    d = WAN_TINY.dim
    r = 4
    rng = np.random.default_rng(0)
    sd = {}
    for i in range(WAN_TINY.num_layers):
        sd[f"blocks.{i}.self_attn.q.lora_A.weight"] = \
            rng.normal(size=(r, d)).astype(np.float32)
        sd[f"blocks.{i}.self_attn.q.lora_B.weight"] = \
            rng.normal(size=(d, r)).astype(np.float32)
        # peft-prefixed ffn entry
        sd[f"base_model.model.blocks.{i}.ffn.0.lora_A.weight"] = \
            rng.normal(size=(r, d)).astype(np.float32)
        sd[f"base_model.model.blocks.{i}.ffn.0.lora_B.weight"] = \
            rng.normal(size=(WAN_TINY.ffn_dim, r)).astype(np.float32)
    lp = lora.load_lora_weights(params, sd, alpha=8.0,
                                 head_dim=WAN_TINY.head_dim)
    q = lp["blocks"]["self_attn"]["q"]
    assert q["lora_A"].shape == (WAN_TINY.num_layers, d, r)
    assert float(q["lora_scale"][0]) == 2.0  # alpha/r
    np.testing.assert_allclose(
        np.asarray(q["lora_A"][1]),
        sd["blocks.1.self_attn.q.lora_A.weight"].T)
    # q lora_B columns must be permuted to the RoPE half layout with the
    # MODEL's head_dim (a hardcoded 128 scrambled WAN_TINY's 2x64 heads)
    from self_forcing_tpu.models.wan.rope import qk_half_perm
    perm = qk_half_perm(WAN_TINY.head_dim, WAN_TINY.num_heads)
    np.testing.assert_allclose(
        np.asarray(q["lora_B"][1]),
        sd["blocks.1.self_attn.q.lora_B.weight"].T[:, perm])
    ffn = lp["blocks"]["ffn"]["fc1"]
    assert ffn["lora_B"].shape == (WAN_TINY.num_layers, r, WAN_TINY.ffn_dim)


def test_lora_label_tree_masks():
    params = dit.init_params(jax.random.PRNGKey(0), WAN_TINY,
                             dtype=jnp.float32)
    lp = lora.apply_lora(params, rank=4)
    labels = lora.lora_label_tree(lp)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    trainable = [p for p, v in flat if v == "train"]
    frozen = [p for p, v in flat if v == "frozen"]
    assert trainable and frozen
    assert any("lora_A" in str(p) for p in trainable)
    assert any("pose_proj" in str(p) for p in trainable)
    # lora_scale stays frozen (a constant); A/B must not be frozen
    assert not any("lora_A" in str(p) or "lora_B" in str(p) for p in frozen)


def test_lora_targets_subset():
    params = dit.init_params(jax.random.PRNGKey(0), WAN_TINY,
                             dtype=jnp.float32)
    lp = lora.apply_lora(params, rank=4, targets=["q", "ffn.0"])
    assert "lora_A" in lp["blocks"]["self_attn"]["q"]
    assert "lora_A" in lp["blocks"]["cross_attn"]["q"]
    assert "lora_A" in lp["blocks"]["ffn"]["fc1"]
    assert "lora_A" not in lp["blocks"]["self_attn"]["k"]
    assert "lora_A" not in lp["blocks"]["ffn"]["fc2"]
    assert lora.has_lora(lp) and not lora.has_lora(params)


@pytest.mark.slow
def test_lora_only_training_freezes_base():
    """One LoRA-only DMD train step: base weights bit-identical, adapters
    moved (reference train_lora_only mode, model/base.py:39-72 +
    configs/self_forcing_dmd.yaml:58-80)."""
    import dataclasses

    from self_forcing_tpu.config import Config
    from self_forcing_tpu.training.trainer_distillation import (
        ScoreDistillationTrainer)

    tiny = dataclasses.replace(WAN_TINY, num_layers=1, dim=64, ffn_dim=128,
                               num_heads=2)
    config = Config({
        "denoising_step_list": [1000, 500], "num_train_timestep": 1000,
        "timestep_shift": 5.0, "guidance_scale": 3.0,
        "denoising_loss_type": "flow", "num_frame_per_block": 1,
        "num_training_frames": 2, "same_step_across_blocks": True,
        "ts_schedule": False, "last_step_only": True, "context_noise": 0,
        "lr": 1e-2, "weight_decay": 0.01, "dfake_gen_update_ratio": 1,
        "ema_weight": 0.0, "seed": 0,
        "image_or_video_shape": [1, 2, 16, 8, 8],
        "train_lora_only": True, "lora_rank": 4, "lora_alpha": 8,
    })
    key = jax.random.PRNGKey(0)
    gen = _randomize_head(dit.init_params(key, tiny, jnp.float32))
    fake = _randomize_head(dit.init_params(jax.random.fold_in(key, 1), tiny,
                                           jnp.float32, causal=False))
    real = _randomize_head(dit.init_params(jax.random.fold_in(key, 2), tiny,
                                           jnp.float32, causal=False))
    neg = jax.random.normal(jax.random.fold_in(key, 3), (1, 8, tiny.text_dim))
    trainer = ScoreDistillationTrainer(config, gen, fake, real, tiny, tiny,
                                       tiny, neg)
    assert trainer.train_lora_only
    before = jax.tree.map(np.asarray, trainer.state.generator)
    ctx = jax.random.normal(jax.random.fold_in(key, 4), (1, 8, tiny.text_dim))
    log = trainer.train_step({"context": ctx})
    assert np.isfinite(log["generator_loss"])
    after = jax.tree.map(np.asarray, trainer.state.generator)

    def walk(b, a, path=""):
        moved, frozen_ok = [], []
        if isinstance(b, dict):
            for k in b:
                m, f = walk(b[k], a[k], f"{path}/{k}")
                moved += m
                frozen_ok += f
            return moved, frozen_ok
        is_trainable = ("lora_A" in path or "lora_B" in path
                        or "pose_proj" in path)
        if is_trainable:
            moved.append((path, not np.array_equal(b, a)))
        else:
            frozen_ok.append((path, np.array_equal(b, a)))
        return moved, frozen_ok

    moved, frozen = walk(before, after)
    # every non-adapter leaf is bit-identical
    bad = [p for p, ok in frozen if not ok]
    assert not bad, f"base weights moved: {bad[:5]}"
    # lora_B starts at zero but gets nonzero grads -> must move
    b_moved = [p for p, m in moved if m and "lora_B" in p]
    assert b_moved, "no lora_B adapter moved"
