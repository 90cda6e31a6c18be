"""Golden tests vs the torch reference WanModel (wan/modules/model.py):
bidirectional forward and the GAN classify mode (register tokens + tap
cross-attention + cls branch)."""
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.utils.checkpoints import convert_dit_state_dict
from tests.test_causal_golden import _load_ref_causal

CFG = WanConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=2,
                text_dim=64, freq_dim=32)
B, F, C, H, W = 1, 3, 16, 8, 8


@pytest.fixture(scope="module")
def ref_model():
    import torch
    _load_ref_causal()  # installs wan.modules.* with the SDPA oracle
    model_mod = sys.modules["wan.modules.model"]
    torch.manual_seed(1)
    m = model_mod.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=512, in_dim=C,
        dim=CFG.dim, ffn_dim=CFG.ffn_dim, freq_dim=CFG.freq_dim,
        text_dim=CFG.text_dim, out_dim=C, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, qk_norm=True, cross_attn_norm=True,
        eps=1e-6)
    with torch.no_grad():
        m.head.head.weight.normal_(0, 0.02)
        m.head.head.bias.normal_(0, 0.02)
    return model_mod, m.eval().float()


def test_bidirectional_forward_matches_reference(ref_model):
    import torch
    _, model = ref_model
    rng = np.random.default_rng(1)
    x_np = rng.normal(size=(B, C, F, H, W)).astype(np.float32) * 0.5
    ctx_np = rng.normal(size=(B, 30, CFG.text_dim)).astype(np.float32)
    t_val = 400.0

    with torch.no_grad():
        ref = model(
            [torch.from_numpy(x_np[i]) for i in range(B)],
            torch.full((B,), t_val),
            [torch.from_numpy(ctx_np[i]) for i in range(B)],
            seq_len=F * (H // 2) * (W // 2)).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state_dict(sd, CFG, dtype=jnp.float32)
    rope = RopeTables.create(CFG.head_dim)
    x = jnp.asarray(x_np).transpose(0, 2, 1, 3, 4)      # B,F,C,H,W
    t = jnp.full((B, F), t_val, jnp.float32)
    out = dit.forward_train(params, CFG, x, t, jnp.asarray(ctx_np), None,
                            rope, remat=False)
    ours = np.asarray(out).transpose(0, 2, 1, 3, 4)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


def test_classify_mode_matches_reference(ref_model):
    import torch
    model_mod, _ = ref_model
    torch.manual_seed(2)
    num_class = 1
    # the reference taps are hard-coded at blocks 13/21/29 (model.py:750)
    # -> classify mode requires a 30-layer model
    CFG30 = WanConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=30,
                      text_dim=64, freq_dim=32)
    model = model_mod.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=512, in_dim=C,
        dim=CFG30.dim, ffn_dim=CFG30.ffn_dim, freq_dim=CFG30.freq_dim,
        text_dim=CFG30.text_dim, out_dim=C, num_heads=CFG30.num_heads,
        num_layers=CFG30.num_layers, qk_norm=True, cross_attn_norm=True,
        eps=1e-6).eval().float()
    # reference cls branch (utils/wan_wrapper.py:182-201 layout)
    cls_pred_branch = torch.nn.Sequential(
        torch.nn.LayerNorm(CFG30.dim * 3),
        torch.nn.Linear(CFG30.dim * 3, CFG30.dim),
        torch.nn.SiLU(),
        torch.nn.Linear(CFG30.dim, num_class))
    register_tokens = model_mod.RegisterTokens(3, CFG30.dim)
    gan_blocks = torch.nn.ModuleList([
        model_mod.GanAttentionBlock(dim=CFG30.dim, ffn_dim=dit.GAN_FFN_DIM,
                                    num_heads=CFG30.num_heads)
        for _ in range(3)])

    rng = np.random.default_rng(2)
    x_np = rng.normal(size=(B, C, F, H, W)).astype(np.float32) * 0.5
    ctx_np = rng.normal(size=(B, 30, CFG30.text_dim)).astype(np.float32)
    t_val = 500.0

    with torch.no_grad():
        _, ref_logits = model(
            [torch.from_numpy(x_np[i]) for i in range(B)],
            torch.full((B,), t_val),
            [torch.from_numpy(ctx_np[i]) for i in range(B)],
            seq_len=F * (H // 2) * (W // 2),
            classify_mode=True, register_tokens=register_tokens,
            cls_pred_branch=cls_pred_branch, gan_ca_blocks=gan_blocks)
    ref_logits = ref_logits.numpy()

    # convert the extras into our cls pytree
    def lin(m):
        return {"w": jnp.asarray(m.weight.detach().numpy().T),
                "b": jnp.asarray(m.bias.detach().numpy())}

    def lin_nobias(m):
        p = {"w": jnp.asarray(m.weight.detach().numpy().T)}
        if m.bias is not None:
            p["b"] = jnp.asarray(m.bias.detach().numpy())
        return p

    ca_blocks = []
    for gb in gan_blocks:
        ca_blocks.append({
            "norm3": {"w": jnp.asarray(gb.norm3.weight.detach().numpy()),
                      "b": jnp.asarray(gb.norm3.bias.detach().numpy())},
            "cross_attn": {
                "q": lin(gb.cross_attn.q), "k": lin(gb.cross_attn.k),
                "v": lin(gb.cross_attn.v), "o": lin(gb.cross_attn.o),
                "norm_q": {"w": jnp.asarray(
                    gb.cross_attn.norm_q.weight.detach().numpy())},
                "norm_k": {"w": jnp.asarray(
                    gb.cross_attn.norm_k.weight.detach().numpy())},
            },
            "ffn": {"fc1": lin(gb.ffn[0]), "fc2": lin(gb.ffn[2])},
        })
    cls_params = {
        "registers": jnp.asarray(
            register_tokens.register_tokens.detach().numpy()),
        "register_norm": {"w": jnp.asarray(
            register_tokens.rms_norm.weight.detach().numpy())},
        "ca_blocks": ca_blocks,
        "cls": {
            "ln": {"w": jnp.asarray(
                cls_pred_branch[0].weight.detach().numpy()),
                "b": jnp.asarray(cls_pred_branch[0].bias.detach().numpy())},
            "fc1": lin(cls_pred_branch[1]),
            "fc2": lin(cls_pred_branch[3]),
        },
    }

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state_dict(sd, CFG30, dtype=jnp.float32)
    rope = RopeTables.create(CFG30.head_dim)
    x = jnp.asarray(x_np).transpose(0, 2, 1, 3, 4)
    t = jnp.full((B, F), t_val, jnp.float32)
    _, logits = dit.forward_classify(params, cls_params, CFG30, x, t,
                                     jnp.asarray(ctx_np), rope, remat=False)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=5e-3, atol=5e-3)
