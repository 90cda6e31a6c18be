"""Model loading runtime: locate + convert Wan checkpoints into the
framework's pytrees (reference checkpoint surface, SURVEY.md §2.12).

Looks for the reference's file layout under a model directory:
- Wan2.1-T2V-1.3B/  (diffusers directory with *.safetensors)
- models_t5_umt5-xxl-enc-bf16.pth
- Wan2.1_VAE.pth
- google/umt5-xxl/  (tokenizer)
- self_forcing_dmd.pt  ({'generator', 'generator_ema'[, 'critic']})

Missing files raise with a clear message; tests use random init instead.
"""
from __future__ import annotations

import dataclasses
import glob
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit, t5 as t5_mod, vae as vae_mod
from self_forcing_tpu.models.wan.configs import WAN_1_3B, WAN_14B, WanConfig
from self_forcing_tpu.utils import checkpoints as ckpt

# shared negative prompt (wan/configs/shared_config.py:19)
NEGATIVE_PROMPT = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，整体发灰，最差质量，"
    "低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，画得不好的手部，画得不好的脸部，畸形的，"
    "毁容的，形态畸形的肢体，手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
)


@dataclasses.dataclass
class WanModels:
    generator: dict
    generator_cfg: WanConfig
    t5_params: Optional[dict] = None
    t5_cfg: Optional[t5_mod.T5Config] = None
    vae_params: Optional[dict] = None
    vae_cfg: Optional[vae_mod.VAEConfig] = None
    tokenizer: Optional[object] = None
    negative_prompt: str = NEGATIVE_PROMPT

    def encode_text(self, prompts: list[str]) -> jax.Array:
        assert self.t5_params is not None and self.tokenizer is not None
        ids, mask = self.tokenizer(prompts)
        leaf = jax.tree.leaves(self.t5_params)[0]
        if isinstance(leaf, np.ndarray):
            # host-offloaded T5 (load_wan_models t5_on_host=True): weights
            # stream to the device one layer at a time — the reference
            # demo's DynamicSwapInstaller low-memory mode
            return t5_mod.encode_streamed(self.t5_params, self.t5_cfg,
                                          ids, mask)
        return t5_mod.encode_for_dit(self.t5_params, self.t5_cfg,
                                     jnp.asarray(ids), jnp.asarray(mask))


def _find(model_dir: str, *patterns: str) -> Optional[str]:
    for pat in patterns:
        # recursive=True so '**/' patterns actually recurse (without it
        # glob treats '**' as a single '*' level and deep checkpoint
        # layouts silently resolve to None)
        hits = sorted(glob.glob(os.path.join(model_dir, pat),
                                recursive=True))
        if hits:
            return hits[0]
    return None


def load_dit_params(model_dir: str, cfg: WanConfig,
                    checkpoint_path: str | None = None,
                    checkpoint_key: str = "generator_ema",
                    dtype=jnp.bfloat16) -> dict:
    """Load the Wan base DiT (diffusers dir of safetensors), then overlay a
    self-forcing checkpoint's state dict if given (inference.py:70-71,
    strict=False semantics: matching keys replace, others keep base)."""
    base_dir = _find(model_dir, "Wan2.1-T2V-1.3B", "Wan2.1-T2V-14B",
                     "wan_models/Wan2.1-T2V-1.3B") or model_dir
    shards = sorted(
        glob.glob(os.path.join(base_dir, "*.safetensors")))
    sd = {}
    for s in shards:
        sd.update(ckpt.load_torch_state_dict(s))
    if not sd:
        pth = _find(base_dir, "*.pth", "*.pt")
        if pth:
            sd = ckpt.load_torch_state_dict(pth)
    assert sd, f"no DiT weights under {base_dir}"

    if checkpoint_path:
        st = ckpt.load_torch_state_dict(checkpoint_path)
        if checkpoint_key in st:
            st = st[checkpoint_key]
        elif "generator" in st:
            st = st["generator"]
        st = ckpt.strip_prefix(st, "model.")
        # strict=False merge at the state-dict level: checkpoint keys
        # replace, missing ones keep the base weights — one conversion
        # (the old code converted the base then threw it away, and a
        # partial checkpoint KeyError'd inside the converter)
        sd = {**sd, **st}
    return ckpt.convert_dit_state_dict(sd, cfg, dtype)


def load_wan_models(model_dir: str, causal: bool = True,
                    model_cfg: WanConfig | None = None,
                    checkpoint_path: str | None = None,
                    checkpoint_key: str = "generator_ema",
                    dtype=jnp.bfloat16,
                    load_t5: bool = True, load_vae: bool = True,
                    load_dit: bool = True,
                    t5_on_host: bool = False) -> WanModels:
    """``load_dit=False`` skips the multi-GB DiT load/convert for callers
    that only need T5/VAE (e.g. trainers already holding the models)."""
    cfg = model_cfg or WAN_1_3B
    generator = None
    if load_dit:
        generator = load_dit_params(model_dir, cfg, checkpoint_path,
                                    checkpoint_key, dtype)

    t5_params = t5_cfg = vae_params = vae_cfg = tokenizer = None
    if load_t5:
        t5_path = _find(model_dir, "models_t5_umt5-xxl-enc-bf16.pth",
                        "**/models_t5_umt5-xxl-enc-bf16.pth")
        if t5_path:
            t5_cfg = t5_mod.UMT5_XXL
            t5_params = ckpt.convert_t5_state_dict(
                ckpt.load_torch_state_dict(t5_path), t5_cfg, dtype)
            if t5_on_host:
                # keep the ~11 GB encoder on the host; encode_text then
                # streams weights per layer (t5.encode_streamed)
                t5_params = jax.tree.map(np.asarray,
                                         jax.device_get(t5_params))
        tok_path = _find(model_dir, "google/umt5-xxl", "**/google/umt5-xxl")
        if tok_path:
            from self_forcing_tpu.tokenizer import HuggingfaceTokenizer
            tokenizer = HuggingfaceTokenizer(tok_path, seq_len=512,
                                             clean="whitespace")
    if load_vae:
        vae_path = _find(model_dir, "Wan2.1_VAE.pth", "**/Wan2.1_VAE.pth")
        if vae_path:
            vae_cfg = vae_mod.WAN_VAE
            vae_params = ckpt.convert_vae_state_dict(
                ckpt.load_torch_state_dict(vae_path), vae_cfg, jnp.float32)

    return WanModels(generator=generator, generator_cfg=cfg,
                     t5_params=t5_params, t5_cfg=t5_cfg,
                     vae_params=vae_params, vae_cfg=vae_cfg,
                     tokenizer=tokenizer)


def load_clip_vision(model_dir: str, dtype=jnp.float32):
    """Locate + convert the CLIP vision tower used for i2v/pose image
    conditioning (reference wan/modules/clip.py:501-542, weights file
    models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth).

    Returns (clip_params, clip_cfg) or (None, None) when the file is
    absent (tests construct tiny random towers instead)."""
    from self_forcing_tpu.models import clip as clip_mod
    path = _find(model_dir,
                 "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth",
                 "**/models_clip_open-clip-xlm-roberta-large-vit-huge-14"
                 ".pth")
    if path is None:
        return None, None
    cfg = clip_mod.CLIP_XLM_ROBERTA_VIT_H_14
    params = clip_mod.convert_clip_vision_state_dict(
        ckpt.load_torch_state_dict(path), cfg, dtype)
    return params, cfg
