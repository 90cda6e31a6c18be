"""Golden test: teacher-forcing training forward ([clean | noisy] doubled
sequence) vs the torch reference (causal_model.py _forward_train +
_prepare_teacher_forcing_mask), with flex_attention replaced by a dense
masked-SDPA oracle."""
import math
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.ops.masks import teacher_forcing_mask
from self_forcing_tpu.utils.checkpoints import convert_dit_state_dict
from tests.test_causal_golden import _load_ref_causal

CFG = WanConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=2,
                text_dim=64, freq_dim=32, num_frame_per_block=2)
# fs=24 so the doubled sequence (192) is NOT a multiple of 128 — the
# reference's flex path slices [:-padded_length], which breaks when the
# pad is 0 (it never is at real geometry).
B, F, C, H, W = 1, 4, 16, 8, 12
FS = (H // 2) * (W // 2)


def _patch_flex(mod):
    import torch

    def fake_create_block_mask(mask_mod, B, H, Q_LEN, KV_LEN,
                               _compile=False, device=None):
        q = torch.arange(Q_LEN, dtype=torch.long)[:, None]
        k = torch.arange(KV_LEN, dtype=torch.long)[None, :]
        return mask_mod(None, None, q, k)  # dense bool [Q, KV]

    def fake_flex(query, key, value, block_mask=None):
        # [B, H, L, D] like torch flex_attention
        d = query.shape[-1]
        s = query.float() @ key.float().transpose(-1, -2) / math.sqrt(d)
        s = s.masked_fill(~block_mask, float("-inf"))
        p = torch.softmax(s, dim=-1)
        p = torch.nan_to_num(p)  # fully-masked (padded) rows
        return p @ value.float()

    mod.create_block_mask = fake_create_block_mask
    mod.flex_attention = fake_flex


def test_teacher_forcing_forward_matches_reference():
    import torch
    mod = _load_ref_causal()
    _patch_flex(mod)
    torch.manual_seed(3)
    model = mod.CausalWanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=512, in_dim=C,
        dim=CFG.dim, ffn_dim=CFG.ffn_dim, freq_dim=CFG.freq_dim,
        text_dim=CFG.text_dim, out_dim=C, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, qk_norm=True, cross_attn_norm=True,
        eps=1e-6)
    model.num_frame_per_block = CFG.num_frame_per_block
    with torch.no_grad():
        model.head.head.weight.normal_(0, 0.02)
        model.head.head.bias.normal_(0, 0.02)
    model = model.eval().float()

    rng = np.random.default_rng(3)
    noisy_np = rng.normal(size=(B, C, F, H, W)).astype(np.float32) * 0.5
    clean_np = rng.normal(size=(B, C, F, H, W)).astype(np.float32) * 0.5
    ctx_np = rng.normal(size=(B, 24, CFG.text_dim)).astype(np.float32)
    t_np = np.repeat(np.array([[600.0, 200.0]], np.float32), 2, axis=1)
    aug_np = np.full((B, F), 50.0, np.float32)

    with torch.no_grad():
        # the wrapper passes batched TENSORS, not lists (the docstring
        # lies; iterating a tensor yields [C,F,H,W] slices anyway)
        ref = model(
            torch.from_numpy(noisy_np),
            torch.from_numpy(t_np),
            [torch.from_numpy(ctx_np[i]) for i in range(B)],
            seq_len=F * FS,
            clean_x=torch.from_numpy(clean_np),
            aug_t=torch.from_numpy(aug_np)).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state_dict(sd, CFG, dtype=jnp.float32)
    rope = RopeTables.create(CFG.head_dim)
    mask = teacher_forcing_mask(F, FS, CFG.num_frame_per_block)
    out = dit.forward_train(
        params, CFG,
        jnp.asarray(noisy_np).transpose(0, 2, 1, 3, 4),
        jnp.asarray(t_np), jnp.asarray(ctx_np), mask, rope,
        clean_x=jnp.asarray(clean_np).transpose(0, 2, 1, 3, 4),
        aug_t=jnp.asarray(aug_np), remat=False)
    ours = np.asarray(out).transpose(0, 2, 1, 3, 4)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def test_block_causal_train_forward_matches_reference():
    """clean_x=None path: block-causal flex mask
    (_prepare_blockwise_causal_attn_mask, causal_model.py:518-574)."""
    import torch
    from self_forcing_tpu.ops.masks import block_causal_mask
    mod = _load_ref_causal()
    _patch_flex(mod)
    torch.manual_seed(4)
    model = mod.CausalWanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=512, in_dim=C,
        dim=CFG.dim, ffn_dim=CFG.ffn_dim, freq_dim=CFG.freq_dim,
        text_dim=CFG.text_dim, out_dim=C, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, qk_norm=True, cross_attn_norm=True,
        eps=1e-6)
    model.num_frame_per_block = CFG.num_frame_per_block
    with torch.no_grad():
        model.head.head.weight.normal_(0, 0.02)
        model.head.head.bias.normal_(0, 0.02)
    model = model.eval().float()

    rng = np.random.default_rng(4)
    x_np = rng.normal(size=(B, C, F, H, W)).astype(np.float32) * 0.5
    ctx_np = rng.normal(size=(B, 24, CFG.text_dim)).astype(np.float32)
    t_np = np.repeat(np.array([[800.0, 300.0]], np.float32), 2, axis=1)

    with torch.no_grad():
        ref = model(torch.from_numpy(x_np), torch.from_numpy(t_np),
                    [torch.from_numpy(ctx_np[i]) for i in range(B)],
                    seq_len=F * FS).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state_dict(sd, CFG, dtype=jnp.float32)
    rope = RopeTables.create(CFG.head_dim)
    mask = block_causal_mask(F, FS, CFG.num_frame_per_block)
    out = dit.forward_train(
        params, CFG, jnp.asarray(x_np).transpose(0, 2, 1, 3, 4),
        jnp.asarray(t_np), jnp.asarray(ctx_np), mask, rope, remat=False)
    ours = np.asarray(out).transpose(0, 2, 1, 3, 4)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)
