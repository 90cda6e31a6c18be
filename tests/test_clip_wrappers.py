"""CLIP vision/text towers, tokenizer cleaning, and the wrapper facade
(reference wan/modules/clip.py, wan/modules/tokenizers.py,
utils/wan_wrapper.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models import clip as clip_mod
from self_forcing_tpu.models.wan import dit, vae as vae_mod
from self_forcing_tpu.models.wan.configs import WAN_TINY
from self_forcing_tpu.wrappers import WanDiffusionWrapper, WanVAEWrapper

CFG = clip_mod.CLIP_TINY


def test_vision_tower_shapes():
    params = clip_mod.init_vision_params(jax.random.PRNGKey(0), CFG)
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (2, 3, CFG.image_size, CFG.image_size))
    tokens = clip_mod.vision_forward(params, CFG, imgs, use_31_block=True)
    P = (CFG.image_size // CFG.patch_size) ** 2
    assert tokens.shape == (2, P + 1, CFG.vision_dim)
    full = clip_mod.vision_forward(params, CFG, imgs, use_31_block=False)
    assert full.shape == tokens.shape
    # use_31_block runs one fewer layer -> different activations
    assert float(jnp.abs(full - tokens).max()) > 0


def test_encode_image_resizes():
    params = clip_mod.init_vision_params(jax.random.PRNGKey(0), CFG)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 56, 40))
    tokens = clip_mod.encode_image(params, CFG, imgs)
    P = (CFG.image_size // CFG.patch_size) ** 2
    assert tokens.shape == (1, P + 1, CFG.vision_dim)
    assert np.isfinite(np.asarray(tokens)).all()


def test_text_tower():
    params = clip_mod.init_text_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.array([[5, 6, 7, CFG.pad_id, CFG.pad_id]], jnp.int32)
    feats = clip_mod.text_forward(params, CFG, ids)
    assert feats.shape == (1, 5, CFG.text_dim)
    pooled = clip_mod.text_pooled(params, CFG, ids)
    assert pooled.shape == (1, CFG.embed_dim)


def test_tokenizer_cleaning():
    from self_forcing_tpu.tokenizer import (basic_clean, canonicalize,
                                            whitespace_clean)
    assert whitespace_clean("a   b\t\nc") == "a b c"
    assert basic_clean("café  &amp; tea") == "café  & tea"
    assert canonicalize("Hello, World_2!") == "hello world 2"


def test_vision_converter_matches_torch_layout():
    """Patch-embedding conversion must match torch Conv2d flattening."""
    import torch
    D, ph = CFG.vision_dim, CFG.patch_size
    conv = torch.nn.Conv2d(3, D, ph, stride=ph, bias=True)
    x = torch.randn(1, 3, CFG.image_size, CFG.image_size)
    with torch.no_grad():
        ref = conv(x).flatten(2).permute(0, 2, 1).numpy()  # [1, P, D]

    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0).reshape(-1, D)
    xt = jnp.asarray(x.numpy()).transpose(0, 2, 3, 1)
    h = w_count = CFG.image_size // ph
    xt = xt.reshape(1, h, ph, w_count, ph, 3).transpose(0, 1, 3, 2, 4, 5)
    xt = xt.reshape(1, h * w_count, ph * ph * 3)
    ours = xt @ jnp.asarray(w) + jnp.asarray(conv.bias.detach().numpy())
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_wan_diffusion_wrapper_paths():
    params = dit.init_params(jax.random.PRNGKey(0), WAN_TINY,
                             dtype=jnp.float32)
    w = WanDiffusionWrapper(params, WAN_TINY.__class__(
        **{**WAN_TINY.__dict__, "num_frame_per_block": 2}), is_causal=True)
    B, F, C, H, W_ = 1, 4, 16, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, F, C, H, W_))
    cond = {"prompt_embeds": jax.random.normal(
        jax.random.PRNGKey(2), (B, 8, WAN_TINY.text_dim))}
    t = jnp.full((B, F), 500.0)

    flow, x0 = w(x, cond, t)                                # causal train
    assert flow.shape == x.shape and x0.shape == x.shape

    flow_tf, _ = w(x, cond, t, clean_x=x * 0.5)             # teacher forcing
    assert flow_tf.shape == x.shape

    w.adding_cls_branch(num_class=3)                        # classify
    flow_c, x0_c, logits = w(x, cond, t, classify_mode=True)
    assert logits.shape == (B, 3)

    fs = (H // 2) * (W_ // 2)
    cache = dit.init_kv_cache(w.cfg, B, fs, F, x.dtype)     # kv-cache path
    ctx_kv = dit.precompute_context(params, w.cfg, cond["prompt_embeds"])
    (flow_i, x0_i), new_cache = w(x[:, :2], cond, t[:, :2], kv_cache=cache,
                                  crossattn_cache=ctx_kv, current_start=0)
    assert flow_i.shape == (B, 2, C, H, W_)
    assert int(new_cache.local_end) == 2 * fs


@pytest.mark.slow
def test_wan_vae_wrapper_streaming_matches_batch():
    params = vae_mod.init_params(jax.random.PRNGKey(0), vae_mod.VAE_TINY)
    w = WanVAEWrapper(params, vae_mod.VAE_TINY)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 4, 4))
    full = w.decode_to_pixel(lat)
    w.reset_cache()
    s1 = w.decode_to_pixel(lat[:, :2], use_cache=True)
    s2 = w.decode_to_pixel(lat[:, 2:], use_cache=True)
    streamed = jnp.concatenate([s1, s2], axis=1)
    assert full.shape == streamed.shape
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                               rtol=5e-4, atol=5e-4)


def test_vae_wrapper_roundtrip_shapes():
    params = vae_mod.init_params(jax.random.PRNGKey(0), vae_mod.VAE_TINY)
    w = WanVAEWrapper(params, vae_mod.VAE_TINY)
    px = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 3, 32, 32))
    z = w.encode_to_latent(px)
    assert z.shape == (1, 2, vae_mod.VAE_TINY.z_dim, 4, 4)
    out = w.decode_to_pixel(z)
    assert out.shape == (1, 5, 3, 32, 32)


def test_preprocess_matches_torch_bicubic():
    """Resize matches torch F.interpolate(mode='bicubic',
    align_corners=False) exactly (the reference preprocessing,
    clip.py:528-538) — jax.image.resize uses a different cubic kernel."""
    import torch
    import torch.nn.functional as F
    from self_forcing_tpu.models.clip import CLIPConfig, preprocess_images
    cfg = CLIPConfig(image_size=16)
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (2, 3, 40, 56)).astype(np.float32)
    with torch.no_grad():
        ref = F.interpolate(torch.tensor(img), size=(16, 16),
                            mode="bicubic", align_corners=False).numpy()
    out = np.asarray(preprocess_images(jnp.asarray(img), cfg))
    # undo the normalization to compare the raw resize
    from self_forcing_tpu.models.clip import CLIP_MEAN, CLIP_STD
    raw = out * np.asarray(CLIP_STD)[None, :, None, None] \
        + np.asarray(CLIP_MEAN)[None, :, None, None]
    raw = (raw - 0.5) * 2.0
    np.testing.assert_allclose(raw, ref, rtol=2e-4, atol=2e-4)


def test_text_forward_masks_pad_tokens():
    """Pad positions must not change real-token features
    (xlm_roberta.py:123-138 additive mask)."""
    from self_forcing_tpu.models.clip import (CLIPConfig, init_text_params,
                                              text_forward)
    cfg = CLIPConfig(text_dim=32, text_heads=2, text_layers=2,
                     vocab_size=64, max_text_len=16)
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ids = jnp.asarray([[5, 6, 7, cfg.pad_id, cfg.pad_id]])
    ids2 = jnp.asarray([[5, 6, 7, 9, 33]]).at[:, 3:].set(cfg.pad_id)
    a = text_forward(params, cfg, ids)
    b = text_forward(params, cfg, ids2)
    np.testing.assert_allclose(np.asarray(a[:, :3]), np.asarray(b[:, :3]),
                               rtol=1e-6, atol=1e-6)
