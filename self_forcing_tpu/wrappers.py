"""Model wrapper facade — API parity with the reference's
utils/wan_wrapper.py (WanTextEncoder :15-55, WanVAEWrapper :58-117,
WanDiffusionWrapper :120-371).

These are thin callable facades over the functional modules so a reference
user finds the same names and call conventions; the compute lives in
models/wan/{t5,vae,dit}.py and scheduler.py.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from self_forcing_tpu.models.wan import dit, t5 as t5_mod, vae as vae_mod
from self_forcing_tpu.models.wan.configs import WanConfig, WAN_1_3B
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.ops.masks import (block_causal_mask,
                                        block_causal_mask_i2v,
                                        teacher_forcing_mask)
from self_forcing_tpu.scheduler import FlowMatchScheduler


class WanTextEncoder:
    """umt5-xxl encoder callable: prompts -> {'prompt_embeds': [B, 512,
    4096]} with padding zeroed (utils/wan_wrapper.py:42-55)."""

    def __init__(self, params, cfg: t5_mod.T5Config = t5_mod.UMT5_XXL,
                 tokenizer=None, seq_len: int = 512):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.seq_len = seq_len
        self._encode = jax.jit(
            lambda p, ids, mask: t5_mod.encode_for_dit(p, cfg, ids, mask))

    def __call__(self, text_prompts: List[str]) -> dict:
        assert self.tokenizer is not None, "construct with a tokenizer"
        ids, mask = self.tokenizer(text_prompts)
        embeds = self._encode(self.params, jnp.asarray(ids),
                              jnp.asarray(mask))
        return {"prompt_embeds": embeds}


class WanVAEWrapper:
    """encode_to_latent / decode_to_pixel with the Wan normalization
    constants (utils/wan_wrapper.py:58-117).  Tensors are channels-first
    [B, T, C, H, W] at this boundary, matching the reference."""

    def __init__(self, params, cfg: vae_mod.VAEConfig = vae_mod.WAN_VAE):
        self.params = params
        self.cfg = cfg
        self._cache = None

    def encode_to_latent(self, pixels: jax.Array) -> jax.Array:
        """[B, T_px, 3, H, W] in [-1, 1] -> [B, T_lat, 16, H/8, W/8]."""
        x = pixels.transpose(0, 1, 3, 4, 2)
        z = vae_mod.encode(self.params, self.cfg, x)
        return z.transpose(0, 1, 4, 2, 3)

    def decode_to_pixel(self, latent: jax.Array,
                        use_cache: bool = False) -> jax.Array:
        """[B, T_lat, 16, h, w] -> [B, T_px, 3, H, W] in [-1, 1].

        use_cache=True streams: the decoder conv caches persist across
        calls (reference cached_decode, utils/wan_wrapper.py:94-117)."""
        z = latent.transpose(0, 1, 3, 4, 2)
        if not use_cache:
            px = vae_mod.decode(self.params, self.cfg, z)
            return px.transpose(0, 1, 4, 2, 3)
        B, T = z.shape[:2]
        if self._cache is None:
            self._cache = vae_mod.init_decoder_cache(
                self.params, self.cfg, B, z.shape[2], z.shape[3], z.dtype)
            out0, self._cache = vae_mod.decode_frame(
                self.params, self.cfg, z[:, :1], self._cache, first=True)
            outs = [out0]
            rest = range(1, T)
        else:
            outs = []
            rest = range(T)
        for i in rest:
            y, self._cache = vae_mod.decode_frame(
                self.params, self.cfg, z[:, i:i + 1], self._cache,
                first=False)
            outs.append(y)
        px = jnp.concatenate(outs, axis=1)
        return jnp.clip(px, -1, 1).transpose(0, 1, 4, 2, 3)

    def reset_cache(self):
        self._cache = None


class WanDiffusionWrapper:
    """Uniform facade over causal/bidirectional Wan DiT
    (utils/wan_wrapper.py:120-371): multiplexes KV-cache inference /
    teacher forcing (clean_x) / classify mode and converts flow <-> x0.

    forward(noisy, conditional_dict, timestep, ...) returns
    (flow_pred, pred_x0[, logits]) exactly like the reference (:253-349).
    """

    def __init__(self, params, model_cfg: WanConfig = WAN_1_3B,
                 is_causal: bool = True, timestep_shift: float = 5.0,
                 cls_params=None):
        self.params = params
        self.cfg = model_cfg
        self.is_causal = is_causal
        self.uniform_timestep = not is_causal
        self.rope = RopeTables.create(model_cfg.head_dim)
        self.scheduler = FlowMatchScheduler.create(
            1000, shift=timestep_shift, training=True)
        self.seq_len = 32760  # 21 frames x 1560 (utils/wan_wrapper.py:176)
        self.cls_params = cls_params
        self.post_init()

    def post_init(self):
        pass

    def enable_gradient_checkpointing(self):
        pass  # remat is on by default in forward_train

    def get_scheduler(self) -> FlowMatchScheduler:
        return self.scheduler

    @staticmethod
    def _convert_flow_pred_to_x0(scheduler, flow_pred, xt, timestep):
        return scheduler.convert_flow_pred_to_x0(flow_pred, xt, timestep)

    def _mask_for(self, num_frames: int, frame_seqlen: int):
        if self.cfg.independent_first_frame:
            return block_causal_mask_i2v(
                num_frames, frame_seqlen, self.cfg.num_frame_per_block,
                self.cfg.local_attn_size)
        return block_causal_mask(
            num_frames, frame_seqlen, self.cfg.num_frame_per_block,
            self.cfg.local_attn_size)

    def __call__(self, *a, **k):
        return self.forward(*a, **k)

    def forward(self, noisy_image_or_video: jax.Array,
                conditional_dict: dict, timestep: jax.Array,
                kv_cache: Optional[dit.KVCache] = None,
                crossattn_cache: Optional[dict] = None,
                current_start: Optional[int] = None,
                cache_start: Optional[int] = None,
                classify_mode: bool = False,
                concat_time_embeddings: bool = False,
                clean_x: Optional[jax.Array] = None,
                aug_t: Optional[jax.Array] = None,
                add_condition: Optional[jax.Array] = None,
                clip_feature: Optional[jax.Array] = None,
                y: Optional[jax.Array] = None):
        x = noisy_image_or_video
        B, F, C, H, W = x.shape
        fs = (H // self.cfg.patch_size[1]) * (W // self.cfg.patch_size[2])
        context = conditional_dict["prompt_embeds"]
        add_condition = (add_condition if add_condition is not None
                         else conditional_dict.get("add_condition"))
        clip_feature = (clip_feature if clip_feature is not None
                        else conditional_dict.get("clip_feature"))
        y = y if y is not None else conditional_dict.get("y")
        t = jnp.asarray(timestep, jnp.float32)
        if t.ndim == 1:
            t = jnp.broadcast_to(t[:, None], (B, F))

        logits = None
        new_cache = None
        if kv_cache is not None:
            ctx_kv = (crossattn_cache if crossattn_cache is not None
                      else dit.precompute_context(self.params, self.cfg,
                                                  context, clip_feature))
            start_frame = jnp.int32((current_start or 0) // fs)
            cache_frame = None if cache_start is None else \
                jnp.int32(cache_start // fs)
            flow, new_cache = dit.forward_inference(
                self.params, self.cfg, x, t, ctx_kv, kv_cache, start_frame,
                self.rope, y=y, add_condition=add_condition,
                cache_start_frame=cache_frame)
        elif clean_x is not None:
            mask = teacher_forcing_mask(F, fs, self.cfg.num_frame_per_block)
            flow = dit.forward_train(
                self.params, self.cfg, x, t, context, mask, self.rope,
                clean_x=clean_x, aug_t=aug_t, y=y, clip_fea=clip_feature,
                add_condition=add_condition)
        elif classify_mode:
            assert self.cls_params is not None, "call adding_cls_branch()"
            flow, logits = dit.forward_classify(
                self.params, self.cls_params, self.cfg, x, t, context,
                self.rope, concat_time_embeddings=concat_time_embeddings)
        else:
            mask = self._mask_for(F, fs) if self.is_causal else None
            flow = dit.forward_train(
                self.params, self.cfg, x, t, context, mask, self.rope,
                y=y, clip_fea=clip_feature, add_condition=add_condition)

        flat = lambda a: a.reshape((B * F,) + a.shape[2:])
        pred_x0 = self.scheduler.convert_flow_pred_to_x0(
            flat(flow), flat(x), t.reshape(-1)).reshape(x.shape)

        if logits is not None:
            return flow, pred_x0, logits
        if new_cache is not None:
            return (flow, pred_x0), new_cache
        return flow, pred_x0

    def adding_cls_branch(self, atten_dim: int | None = None,
                          num_class: int = 1, time_embed_dim: int = 0,
                          key: jax.Array | None = None):
        """Attach the GAN discriminator head
        (utils/wan_wrapper.py:182-201)."""
        self.cls_params = dit.init_cls_branch_params(
            key if key is not None else jax.random.PRNGKey(0),
            self.cfg, num_class=num_class, time_embed_dim=time_embed_dim)
        return self.cls_params
