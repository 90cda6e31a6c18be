"""CLIP (XLM-Roberta + ViT-H/14) — image conditioning encoder, TPU-native.

Re-implements the reference's vision tower (wan/modules/clip.py:209-301)
and XLM-Roberta text tower (wan/modules/xlm_roberta.py) used for i2v /
pose conditioning: ``visual()`` returns the 257x1280 image tokens from the
first 31 of 32 transformer layers (`use_31_block=True`,
wan/modules/clip.py:501-542).

Config is the open-clip XLM-R-Large ViT-Huge-14 (clip.py:471-498):
image 224/patch 14, vision dim 1280 x 32 layers x 16 heads (gelu),
text dim 1024 x 24 layers (post-norm), embed_dim 1024.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

# CLIP normalization constants (torchvision transforms in _clip)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 1024
    image_size: int = 224
    patch_size: int = 14
    vision_dim: int = 1280
    vision_mlp_ratio: float = 4
    vision_heads: int = 16
    vision_layers: int = 32
    activation: str = "gelu"
    vocab_size: int = 250002
    max_text_len: int = 514
    pad_id: int = 1
    text_dim: int = 1024
    text_heads: int = 16
    text_layers: int = 24
    eps: float = 1e-5


CLIP_XLM_ROBERTA_VIT_H_14 = CLIPConfig()
CLIP_TINY = CLIPConfig(embed_dim=16, image_size=28, patch_size=14,
                       vision_dim=32, vision_heads=2, vision_layers=3,
                       vocab_size=128, max_text_len=16, text_dim=32,
                       text_heads=2, text_layers=2)


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    n = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (n * p["w"] + p["b"]).astype(x.dtype)


def _attn(p, x, num_heads, mask=None):
    """SelfAttention (clip.py:53-91): fused qkv, bidirectional.
    ``mask``: optional bool [B, L] — False keys are excluded (the XLM-R
    text tower masks pad positions, xlm_roberta.py:123-138)."""
    B, L, C = x.shape
    qkv = x @ p["to_qkv"]["w"] + p["to_qkv"]["b"]
    q, k, v = jnp.split(qkv.reshape(B, L, 3, num_heads, -1), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    d = q.shape[-1]
    s = jnp.einsum("bqnd,bknd->bnqk", q, k,
                   preferred_element_type=jnp.float32) * (d ** -0.5)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", a, v).reshape(B, L, C)
    return o @ p["proj"]["w"] + p["proj"]["b"]


def _mlp(p, x, activation):
    h = x @ p["fc1"]["w"] + p["fc1"]["b"]
    if activation == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    return h @ p["fc2"]["w"] + p["fc2"]["b"]


def _block(p, x, num_heads, activation, eps, post_norm=False, mask=None):
    if post_norm:  # XLM-R style
        x = _ln(p["norm1"], x + _attn(p["attn"], x, num_heads, mask), eps)
        x = _ln(p["norm2"], x + _mlp(p["mlp"], x, activation), eps)
    else:          # ViT pre-norm
        x = x + _attn(p["attn"], _ln(p["norm1"], x, eps), num_heads, mask)
        x = x + _mlp(p["mlp"], _ln(p["norm2"], x, eps), activation)
    return x


# ---------------------------------------------------------------- vision

def vision_forward(params: Params, cfg: CLIPConfig, x: jax.Array,
                   use_31_block: bool = True) -> jax.Array:
    """x: [B, 3, H, W] normalized -> tokens [B, 1+P, vision_dim]
    (VisionTransformer.forward, clip.py:279-301)."""
    B = x.shape[0]
    ph = cfg.patch_size
    xt = x.transpose(0, 2, 3, 1)  # NHWC
    h, w = xt.shape[1] // ph, xt.shape[2] // ph
    xt = xt.reshape(B, h, ph, w, ph, 3).transpose(0, 1, 3, 2, 4, 5)
    xt = xt.reshape(B, h * w, ph * ph * 3)
    tokens = xt @ params["patch_embedding"]["w"]
    if "b" in params["patch_embedding"]:
        tokens = tokens + params["patch_embedding"]["b"]

    cls = jnp.broadcast_to(params["cls_embedding"].astype(tokens.dtype),
                           (B, 1, cfg.vision_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["pos_embedding"].astype(tokens.dtype)
    tokens = _ln(params["pre_norm"], tokens, cfg.eps)

    n_layers = cfg.vision_layers - (1 if use_31_block else 0)

    def body(tok, bp):
        return _block(bp, tok, cfg.vision_heads, cfg.activation,
                      cfg.eps), None

    tokens, _ = jax.lax.scan(
        body, tokens, jax.tree.map(lambda a: a[:n_layers],
                                   params["blocks"]))
    if not use_31_block:
        tokens = _ln(params["post_norm"], tokens, cfg.eps)
    return tokens


def _torch_bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Interpolation matrix [out, in] matching torch F.interpolate
    (mode='bicubic', align_corners=False, antialias=False): cubic
    convolution with a=-0.75, no antialias prefilter.  jax.image.resize
    differs on both counts (Keys a=-0.5 + antialiased downscale), which
    drifted the CLIP conditioning tokens from the reference."""
    a = -0.75
    scale = in_size / out_size
    W = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        for k in range(-1, 3):
            t = abs(x - (x0 + k))
            if t <= 1:
                w = (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
            elif t < 2:
                w = a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
            else:
                w = 0.0
            W[i, int(np.clip(x0 + k, 0, in_size - 1))] += w
    return W


def preprocess_images(images: jax.Array, cfg: CLIPConfig) -> jax.Array:
    """[B, 3, H, W] in [-1, 1] -> resized 224 + CLIP-normalized
    (CLIPModel.visual, clip.py:528-538: torch bicubic resize, then
    normalize ((x*0.5+0.5) - mean) / std)."""
    H, W = images.shape[-2:]
    wh = jnp.asarray(_torch_bicubic_matrix(H, cfg.image_size))
    ww = jnp.asarray(_torch_bicubic_matrix(W, cfg.image_size))
    x = jnp.einsum("oh,bchw->bcow", wh, images.astype(jnp.float32))
    x = jnp.einsum("pw,bcow->bcop", ww, x).astype(images.dtype)
    x = x * 0.5 + 0.5
    mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
    std = jnp.asarray(CLIP_STD)[None, :, None, None]
    return (x - mean) / std


def encode_image(params: Params, cfg: CLIPConfig,
                 images: jax.Array) -> jax.Array:
    """Full i2v conditioning path: preprocess + 31-block vision tokens
    [B, 257, 1280]."""
    return vision_forward(params, cfg, preprocess_images(images, cfg),
                          use_31_block=True)


# ---------------------------------------------------------------- text

def text_forward(params: Params, cfg: CLIPConfig,
                 ids: jax.Array) -> jax.Array:
    """XLM-Roberta tower (wan/modules/xlm_roberta.py): embeddings + 24
    post-norm blocks; returns per-token features [B, L, text_dim]."""
    B, L = ids.shape
    mask = (ids != cfg.pad_id)
    tok = params["token_embedding"][ids]
    # roberta position ids: pad positions keep pad_id; others count from
    # pad_id+1 (xlm_roberta.py position embedding convention)
    pos = jnp.cumsum(mask.astype(jnp.int32), axis=1) * mask + cfg.pad_id
    x = tok + params["pos_embedding"][pos] + params["type_embedding"][0]
    x = _ln(params["norm_emb"], x, cfg.eps)

    def body(tok, bp):
        return _block(bp, tok, cfg.text_heads, "gelu", cfg.eps,
                      post_norm=True, mask=mask), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


def text_pooled(params: Params, cfg: CLIPConfig, ids: jax.Array) -> jax.Array:
    """XLMRobertaWithHead (clip.py:303-325): masked mean pool + MLP head to
    embed_dim."""
    x = text_forward(params, cfg, ids)
    mask = (ids != cfg.pad_id).astype(x.dtype)[..., None]
    pooled = jnp.sum(x * mask, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1.0)
    h = pooled @ params["head"]["fc1"]["w"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["head"]["fc2"]["w"]


# ---------------------------------------------------------------- init

def _lin_init(key, din, dout, dtype, bias=True):
    lim = 1 / math.sqrt(din)
    p = {"w": jax.random.uniform(key, (din, dout), dtype, -lim, lim)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _block_init(key, dim, mlp_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm1": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "attn": {"to_qkv": _lin_init(ks[0], dim, dim * 3, dtype),
                 "proj": _lin_init(ks[1], dim, dim, dtype)},
        "norm2": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "mlp": {"fc1": _lin_init(ks[2], dim, mlp_dim, dtype),
                "fc2": _lin_init(ks[3], mlp_dim, dim, dtype)},
    }


def init_vision_params(key: jax.Array, cfg: CLIPConfig,
                       dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    d = cfg.vision_dim
    P = (cfg.image_size // cfg.patch_size) ** 2
    gain = 1.0 / math.sqrt(d)
    blocks = [_block_init(k, d, int(d * cfg.vision_mlp_ratio), dtype)
              for k in jax.random.split(ks[0], cfg.vision_layers)]
    return {
        # pre_norm=True -> no patch bias (clip.py:248-252)
        "patch_embedding": {"w": (jax.random.normal(
            ks[1], (cfg.patch_size * cfg.patch_size * 3, d)) * gain
            ).astype(dtype)},
        "cls_embedding": (jax.random.normal(ks[2], (1, 1, d)) * gain
                          ).astype(dtype),
        "pos_embedding": (jax.random.normal(ks[3], (1, P + 1, d)) * gain
                          ).astype(dtype),
        "pre_norm": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "post_norm": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def init_text_params(key: jax.Array, cfg: CLIPConfig,
                     dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    d = cfg.text_dim
    blocks = [_block_init(k, d, d * 4, dtype)
              for k in jax.random.split(ks[0], cfg.text_layers)]
    mid = (d + cfg.embed_dim) // 2
    return {
        "token_embedding": (jax.random.normal(ks[1], (cfg.vocab_size, d))
                            * 0.02).astype(dtype),
        "pos_embedding": (jax.random.normal(ks[2], (cfg.max_text_len, d))
                          * 0.02).astype(dtype),
        "type_embedding": (jax.random.normal(ks[3], (1, d)) * 0.02
                           ).astype(dtype),
        "norm_emb": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "head": {"fc1": _lin_init(ks[4], d, mid, dtype, bias=False),
                 "fc2": _lin_init(ks[5], mid, cfg.embed_dim, dtype,
                                  bias=False)},
    }


# ---------------------------------------------------------------- convert

def convert_clip_vision_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig,
                                   dtype=jnp.float32) -> Params:
    """Torch XLMRobertaCLIP state dict ('visual.' subtree) -> pytree."""
    def _np(t):
        return t if isinstance(t, np.ndarray) else \
            t.detach().to("cpu").float().numpy()

    def lin(name, bias=True):
        p = {"w": jnp.asarray(_np(sd[name + ".weight"]).T, dtype)}
        if bias and name + ".bias" in sd:
            p["b"] = jnp.asarray(_np(sd[name + ".bias"]), dtype)
        return p

    def ln(name):
        return {"w": jnp.asarray(_np(sd[name + ".weight"]), dtype),
                "b": jnp.asarray(_np(sd[name + ".bias"]), dtype)}

    pe = _np(sd["visual.patch_embedding.weight"])  # [D, 3, ph, pw]
    d = pe.shape[0]
    # match vision_forward's patch flatten order (ph, pw, C)
    pe = pe.transpose(2, 3, 1, 0).reshape(-1, d)
    out: Params = {
        "patch_embedding": {"w": jnp.asarray(pe, dtype)},
        "cls_embedding": jnp.asarray(_np(sd["visual.cls_embedding"]), dtype),
        "pos_embedding": jnp.asarray(_np(sd["visual.pos_embedding"]), dtype),
        "pre_norm": ln("visual.pre_norm"),
        "post_norm": ln("visual.post_norm"),
    }
    if "visual.patch_embedding.bias" in sd:
        out["patch_embedding"]["b"] = jnp.asarray(
            _np(sd["visual.patch_embedding.bias"]), dtype)
    blocks = []
    for i in range(cfg.vision_layers):
        pre = f"visual.transformer.{i}"
        blocks.append({
            "norm1": ln(pre + ".norm1"),
            "attn": {"to_qkv": lin(pre + ".attn.to_qkv"),
                     "proj": lin(pre + ".attn.proj")},
            "norm2": ln(pre + ".norm2"),
            "mlp": {"fc1": lin(pre + ".mlp.0"), "fc2": lin(pre + ".mlp.2")},
        })
    out["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return out
