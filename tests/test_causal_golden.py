"""Golden test of THE flagship path: KV-cached causal DiT inference vs the
torch reference (wan/modules/causal_model.py _forward_inference, SDPA
fallback) on tiny geometry — two consecutive blocks through the cache."""
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
from tests.reference_loader import load_ref_module

CFG = WanConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=2,
                text_dim=64, freq_dim=32, num_frame_per_block=2)
B, NB, C, H, W = 1, 2, 16, 8, 8
FS = (H // 2) * (W // 2)  # 16 tokens/frame


def _load_ref_causal():
    """Load causal_model.py with its package-style imports satisfied and
    fp32 SDPA substituted for the flash-attn kernels (CPU oracle)."""
    import torch
    if "wan.modules.causal_model" in sys.modules:
        return sys.modules["wan.modules.causal_model"]
    if "wan" not in sys.modules:
        wan_pkg = types.ModuleType("wan")
        wan_pkg.__path__ = ["/root/reference/wan"]
        modules_pkg = types.ModuleType("wan.modules")
        modules_pkg.__path__ = ["/root/reference/wan/modules"]
        sys.modules["wan"] = wan_pkg
        sys.modules["wan.modules"] = modules_pkg
    attn_mod = load_ref_module("wan/modules/attention.py",
                               "wan.modules.attention")

    def sdpa_fp32(q, k, v, *args, **kwargs):
        # [B, L, N, D] -> SDPA in fp32 (padding masks unused in this test)
        out = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2).float(), k.transpose(1, 2).float(),
            v.transpose(1, 2).float())
        return out.transpose(1, 2).contiguous()

    attn_mod.flash_attention = sdpa_fp32
    attn_mod.attention = sdpa_fp32
    load_ref_module("wan/modules/model.py", "wan.modules.model")
    return load_ref_module("wan/modules/causal_model.py",
                           "wan.modules.causal_model")


@pytest.fixture(scope="module")
def ref_setup():
    import torch
    torch.manual_seed(0)
    mod = _load_ref_causal()
    model = mod.CausalWanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=512, in_dim=C,
        dim=CFG.dim, ffn_dim=CFG.ffn_dim, freq_dim=CFG.freq_dim,
        text_dim=CFG.text_dim, out_dim=C, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, qk_norm=True, cross_attn_norm=True,
        eps=1e-6)
    model.num_frame_per_block = NB
    # zero-init head would make outputs vacuous — randomize
    with torch.no_grad():
        model.head.head.weight.normal_(0, 0.02)
        model.head.head.bias.normal_(0, 0.02)
    model = model.eval().float()
    return mod, model


def _ref_caches(model):
    import torch
    S = 6 * FS  # room for 3 blocks
    kv = [{"k": torch.zeros(B, S, CFG.num_heads, CFG.head_dim),
           "v": torch.zeros(B, S, CFG.num_heads, CFG.head_dim),
           "global_end_index": torch.tensor([0], dtype=torch.long),
           "local_end_index": torch.tensor([0], dtype=torch.long)}
          for _ in range(CFG.num_layers)]
    cross = [{"k": torch.zeros(B, 512, CFG.num_heads, CFG.head_dim),
              "v": torch.zeros(B, 512, CFG.num_heads, CFG.head_dim),
              "is_init": False} for _ in range(CFG.num_layers)]
    return kv, cross


def test_kv_cache_inference_matches_reference(ref_setup):
    import torch
    mod, model = ref_setup
    rng = np.random.default_rng(0)
    ctx_np = rng.normal(size=(B, 40, CFG.text_dim)).astype(np.float32)
    blocks_np = rng.normal(size=(2, B, C, NB, H, W)).astype(np.float32) * 0.5
    t_val = 700.0

    # ---- reference: two consecutive blocks through the KV cache
    kv, cross = _ref_caches(model)
    ref_outs = []
    with torch.no_grad():
        for b in range(2):
            x = torch.from_numpy(blocks_np[b])          # [B, C, F, H, W]
            t = torch.full((B, NB), t_val)
            out = model(
                [u for u in x], t,
                [torch.from_numpy(ctx_np[i]) for i in range(B)],
                seq_len=6 * FS, kv_cache=kv, crossattn_cache=cross,
                current_start=b * NB * FS, cache_start=0)
            ref_outs.append(out.numpy())                 # [B, C, F, H, W]

    # ---- ours
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state_dict(sd, CFG, dtype=jnp.float32)
    rope = RopeTables.create(CFG.head_dim)
    ctx = jnp.asarray(ctx_np)
    ctx_kv = dit.precompute_context(params, CFG, ctx)
    cache = dit.init_kv_cache(CFG, B, FS, 6, jnp.float32)
    for b in range(2):
        x = jnp.asarray(blocks_np[b]).transpose(0, 2, 1, 3, 4)  # B,F,C,H,W
        t = jnp.full((B, NB), t_val, jnp.float32)
        out, cache = dit.forward_inference(params, CFG, x, t, ctx_kv,
                                           cache, jnp.int32(b * NB), rope)
        ours = np.asarray(out).transpose(0, 2, 1, 3, 4)  # -> B,C,F,H,W
        np.testing.assert_allclose(
            ours, ref_outs[b], rtol=5e-3, atol=5e-3,
            err_msg=f"block {b} mismatch")
    # block 1 must actually depend on block 0's cache: rerun block 1 with
    # a fresh cache and check it differs
    cache2 = dit.init_kv_cache(CFG, B, FS, 6, jnp.float32)
    x1 = jnp.asarray(blocks_np[1]).transpose(0, 2, 1, 3, 4)
    out_nocache, _ = dit.forward_inference(
        params, CFG, x1, jnp.full((B, NB), t_val, jnp.float32), ctx_kv,
        cache2, jnp.int32(NB), rope)
    assert float(jnp.abs(out_nocache - jnp.asarray(
        ref_outs[1].transpose(0, 2, 1, 3, 4))).max()) > 1e-3


def test_rolling_window_eviction_matches_reference(ref_setup):
    """local_attn_size window with sink tokens: the cache eviction path
    (causal_model.py:203-229) vs our lax.cond + gather roll."""
    import torch
    mod, _ = ref_setup
    torch.manual_seed(5)
    CFGW = WanConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=2,
                     text_dim=64, freq_dim=32, num_frame_per_block=1,
                     local_attn_size=2, sink_size=1)
    model = mod.CausalWanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=512, in_dim=C,
        dim=CFGW.dim, ffn_dim=CFGW.ffn_dim, freq_dim=CFGW.freq_dim,
        text_dim=CFGW.text_dim, out_dim=C, num_heads=CFGW.num_heads,
        num_layers=CFGW.num_layers, local_attn_size=2, sink_size=1,
        qk_norm=True, cross_attn_norm=True, eps=1e-6)
    model.num_frame_per_block = 1
    with torch.no_grad():
        model.head.head.weight.normal_(0, 0.02)
        model.head.head.bias.normal_(0, 0.02)
    model = model.eval().float()

    rng = np.random.default_rng(5)
    frames_np = rng.normal(size=(5, B, C, 1, H, W)).astype(np.float32) * 0.5
    ctx_np = rng.normal(size=(B, 20, CFGW.text_dim)).astype(np.float32)
    t_val = 600.0

    # reference: cache sized local_attn_size frames (pipeline sizing,
    # causal_inference.py:283-288)
    S = CFGW.local_attn_size * FS
    kv = [{"k": torch.zeros(B, S, CFGW.num_heads, CFGW.head_dim),
           "v": torch.zeros(B, S, CFGW.num_heads, CFGW.head_dim),
           "global_end_index": torch.tensor([0], dtype=torch.long),
           "local_end_index": torch.tensor([0], dtype=torch.long)}
          for _ in range(CFGW.num_layers)]
    cross = [{"k": torch.zeros(B, 512, CFGW.num_heads, CFGW.head_dim),
              "v": torch.zeros(B, 512, CFGW.num_heads, CFGW.head_dim),
              "is_init": False} for _ in range(CFGW.num_layers)]
    ref_outs = []
    with torch.no_grad():
        for f in range(5):
            out = model(
                torch.from_numpy(frames_np[f]),
                torch.full((B, 1), t_val),
                [torch.from_numpy(ctx_np[i]) for i in range(B)],
                seq_len=8 * FS, kv_cache=kv, crossattn_cache=cross,
                current_start=f * FS, cache_start=0)
            ref_outs.append(out.numpy())

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_dit_state_dict(sd, CFGW, dtype=jnp.float32)
    rope = RopeTables.create(CFGW.head_dim)
    ctx_kv = dit.precompute_context(params, CFGW, jnp.asarray(ctx_np))
    cache = dit.init_kv_cache(CFGW, B, FS, 8, jnp.float32)
    assert cache.k.shape[2] == S  # windowed sizing
    for f in range(5):
        x = jnp.asarray(frames_np[f]).transpose(0, 2, 1, 3, 4)
        out, cache = dit.forward_inference(
            params, CFGW, x, jnp.full((B, 1), t_val, jnp.float32), ctx_kv,
            cache, jnp.int32(f), rope)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 2, 1, 3, 4), ref_outs[f],
            rtol=5e-3, atol=5e-3, err_msg=f"frame {f} mismatch")
