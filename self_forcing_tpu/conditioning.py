"""Pose / image conditioning (UniAnimate-DiT port), TPU-native.

Re-implements the fork's pose conditioning stack:
- ``dwpose_embedding``: 3D CNN mapping DWPose skeleton videos
  [B, 3, 1+F_px, H, W] to per-latent-frame condition features with 5120
  channels at latent/2 resolution (causal_diffusion_inference.py:87-104).
  Temporal strides (1,1,1,1,2,2,1) turn 3+81 pixel frames into 21 latent
  frames; spatial strides (1,1,1,2,2,2,2) take 832x480 -> 52x30.
- ``randomref_embedding_pose``: 2D CNN mapping the reference pose image
  [B, 3, H, W] to a 20-channel latent-resolution bias added to the i2v
  ``y`` conditioning (:106-122).
- ``PoseImageConditioner``: the training-side wrapper combining CLIP image
  features, VAE first-frame latent ``y`` + mask, pose embeddings and
  condition dropout (utils/conditioning.py — NOTE the reference file has a
  SyntaxError at :164 and is dead code as committed; this is the fixed
  behavior per SURVEY.md §2.4).

Layout: channels-last inside (TPU conv layout), channels-first at the API
boundary to match the reference tensors.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict
CONCAT_DIM = 4
RANDOMREF_DIM = 20
POSE_CHANNELS = 5120

# (out_ch, kernel, stride) per layer; SiLU between all but the last.
# Mirrors _get_dwpose_embedding (causal_diffusion_inference.py:87-104).
_DWPOSE_LAYERS = (
    (CONCAT_DIM * 4, (3, 3, 3), (1, 1, 1)),
    (CONCAT_DIM * 4, (3, 3, 3), (1, 1, 1)),
    (CONCAT_DIM * 4, (3, 3, 3), (1, 1, 1)),
    (CONCAT_DIM * 4, (3, 3, 3), (1, 2, 2)),
    (CONCAT_DIM * 4, (3, 3, 3), (2, 2, 2)),
    (CONCAT_DIM * 4, (3, 3, 3), (2, 2, 2)),
    (POSE_CHANNELS, (1, 2, 2), (1, 2, 2)),
)
# _get_randomref_embedding_pose (causal_diffusion_inference.py:106-122)
_RANDOMREF_LAYERS = (
    (CONCAT_DIM * 4, 3, 1),
    (CONCAT_DIM * 4, 3, 1),
    (CONCAT_DIM * 4, 3, 1),
    (CONCAT_DIM * 4, 3, 2),
    (CONCAT_DIM * 4, 3, 2),
    (RANDOMREF_DIM, 3, 2),
)


def _conv_init(key, cin, cout, kernel, dtype):
    fan_in = cin * int(np.prod(kernel))
    lim = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (*kernel, cin, cout), dtype,
                                    -lim, lim),
            "b": jax.random.uniform(k2, (cout,), dtype, -lim, lim)}


def init_dwpose_params(key, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, len(_DWPOSE_LAYERS))
    layers, cin = [], 3
    for k, (cout, kern, _) in zip(ks, _DWPOSE_LAYERS):
        layers.append(_conv_init(k, cin, cout, kern, dtype))
        cin = cout
    return {"layers": layers}


def init_randomref_params(key, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, len(_RANDOMREF_LAYERS))
    layers, cin = [], 3
    for k, (cout, kern, _) in zip(ks, _RANDOMREF_LAYERS):
        layers.append(_conv_init(k, cin, cout, (kern, kern), dtype))
        cin = cout
    return {"layers": layers}


def dwpose_embedding(params: Params, x: jax.Array) -> jax.Array:
    """x: [B, 3, T, H, W] in [0, 1] -> [B, 5120, T', H', W'].

    torch Conv3d padding=1 on k=3 == SAME for stride 1; for stride 2 torch
    pads (1,1) explicitly, matched here with explicit padding.
    """
    h = x.transpose(0, 2, 3, 4, 1)  # NDHWC
    for i, (p, (cout, kern, stride)) in enumerate(
            zip(params["layers"], _DWPOSE_LAYERS)):
        pad = tuple((k // 2, k // 2) if k > 1 else (0, 0) for k in kern)
        if kern == (1, 2, 2):  # final layer: kernel 1x2x2 stride 1x2x2, pad 0
            pad = ((0, 0), (0, 0), (0, 0))
        h = jax.lax.conv_general_dilated(
            h, p["w"].astype(h.dtype), window_strides=stride, padding=pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["b"].astype(h.dtype)
        if i != len(_DWPOSE_LAYERS) - 1:
            h = jax.nn.silu(h)
    return h.transpose(0, 4, 1, 2, 3)


def randomref_embedding(params: Params, x: jax.Array) -> jax.Array:
    """x: [B, 3, H, W] in [0, 1] -> [B, 20, H/8, W/8]."""
    h = x.transpose(0, 2, 3, 1)  # NHWC
    for i, (p, (cout, kern, stride)) in enumerate(
            zip(params["layers"], _RANDOMREF_LAYERS)):
        h = jax.lax.conv_general_dilated(
            h, p["w"].astype(h.dtype), window_strides=(stride, stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"].astype(h.dtype)
        if i != len(_RANDOMREF_LAYERS) - 1:
            h = jax.nn.silu(h)
    return h.transpose(0, 3, 1, 2)


def prepare_dwpose_input(dwpose_data: jax.Array) -> jax.Array:
    """[B, 3, F_px, H, W] u8 -> prepend first frame x3 and scale to [0,1]
    (causal_diffusion_inference.py:334-338)."""
    first = jnp.repeat(dwpose_data[:, :, :1], 3, axis=2)
    return jnp.concatenate([first, dwpose_data], axis=2).astype(
        jnp.float32) / 255.0


def pose_tokens_for_block(dwpose_emb: jax.Array, start_frame: int,
                          num_frames: int) -> jax.Array:
    """Slice [B, C, F, h', w'] pose features for a block and flatten to
    tokens [B, F*h'*w', C] (causal_diffusion_inference.py:383-399).

    Validates coverage like the reference (:386-388) — jnp slicing would
    silently clamp a short pose sequence and either crash opaquely inside
    the token add or condition on the wrong frames."""
    if start_frame + num_frames > dwpose_emb.shape[2]:
        raise ValueError(
            f"dwpose_data has fewer frames than required: block needs "
            f"[{start_frame}, {start_frame + num_frames}) but pose "
            f"features cover {dwpose_emb.shape[2]} frames")
    blk = dwpose_emb[:, :, start_frame:start_frame + num_frames]
    B, C = blk.shape[:2]
    return blk.transpose(0, 2, 3, 4, 1).reshape(B, -1, C)


def load_pose_embedding_weights(state_dict: Mapping[str, Any],
                                dtype=jnp.float32
                                ) -> tuple[Params | None, Params | None]:
    """Filter a UniAnimate LoRA checkpoint for the dwpose_embedding. /
    randomref_embedding_pose. prefixes (causal_diffusion_inference.py:
    124-145) and convert to JAX pytrees."""
    def _np(t):
        return t if isinstance(t, np.ndarray) else \
            t.detach().to("cpu").float().numpy()

    def collect(prefix, conv3d):
        layers = []
        i = 0
        while f"{prefix}{i}.weight" in state_dict:
            w = _np(state_dict[f"{prefix}{i}.weight"])
            b = _np(state_dict[f"{prefix}{i}.bias"])
            if conv3d:  # OIDHW -> DHWIO
                w = w.transpose(2, 3, 4, 1, 0)
            else:       # OIHW -> HWIO
                w = w.transpose(2, 3, 1, 0)
            layers.append({"w": jnp.asarray(w, dtype),
                           "b": jnp.asarray(b, dtype)})
            i += 2  # Sequential indices skip the SiLU modules
        return {"layers": layers} if layers else None

    dw = collect("dwpose_embedding.", conv3d=True)
    rr = collect("randomref_embedding_pose.", conv3d=False)
    return dw, rr


@dataclasses.dataclass
class PoseImageConditioner:
    """Training-side conditioning combiner (fixed re-design of the broken
    utils/conditioning.py, SURVEY.md §2.4): builds the per-batch dict of
    pose condition tokens + optional CLIP/VAE image conditioning with
    condition dropout.

    ``build_conditioning`` mirrors the reference contract
    (utils/conditioning.py:157-182, with its :164 SyntaxError fixed):
    returns {"add_condition" [B, L, 5120], "clip_fea" [B, 257, 1280],
    "y" [B, F, 20, h, w]} — the keys the DMD objectives thread into the
    generator rollout and the score forwards."""

    dwpose_params: Params
    randomref_params: Params | None = None
    drop_prob: float = 0.0
    clip_params: Params | None = None
    clip_cfg: Any = None
    vae_params: Params | None = None
    vae_cfg: Any = None

    def __call__(self, dwpose_data: jax.Array,
                 random_ref_dwpose: Optional[jax.Array] = None,
                 rng: Optional[jax.Array] = None) -> dict:
        x = prepare_dwpose_input(dwpose_data)
        emb = dwpose_embedding(self.dwpose_params, x)
        out = {"dwpose_emb": emb}
        if random_ref_dwpose is not None and self.randomref_params is not None:
            ref = random_ref_dwpose.astype(jnp.float32) / 255.0
            out["randomref_emb"] = randomref_embedding(
                self.randomref_params, ref)
        if self.drop_prob > 0 and rng is not None:
            keep = jax.random.bernoulli(
                rng, 1.0 - self.drop_prob,
                (emb.shape[0],) + (1,) * (emb.ndim - 1))
            out["dwpose_emb"] = jnp.where(keep, emb, jnp.zeros_like(emb))
        return out

    def encode_image(self, first_frame: jax.Array, num_frames: int,
                     height: int, width: int):
        """CLIP visual tokens + masked first-frame VAE latent
        (utils/conditioning.py:130-156).

        first_frame: [B, H0, W0, 3] u8 (dataset layout,
        utils/dataset.py:127-196) or [B, 3, H0, W0] float in [-1, 1];
        num_frames: LATENT frame count F (the reference passes
        image_or_video_shape[1]); height/width: pixel dims.
        Returns (clip_fea [B, 257, 1280], y [B, F, 16+4, h, w])."""
        assert self.clip_params is not None and self.vae_params is not None, \
            "encode_image needs clip_params and vae_params"
        from self_forcing_tpu.models import clip as clip_mod
        from self_forcing_tpu.models.wan import vae as vae_mod

        img = first_frame
        if img.ndim == 4 and img.shape[-1] == 3:     # [B, H, W, 3] u8
            img = img.transpose(0, 3, 1, 2)
        img = img.astype(jnp.float32)
        # u8 -> [-1, 1] (reference: images * (2/255) - 1 when max > 1)
        img = jnp.where(jnp.max(img) > 1.0, img * (2.0 / 255.0) - 1.0, img)

        clip_fea = clip_mod.encode_image(
            self.clip_params, self.clip_cfg or clip_mod.CLIP_XLM_ROBERTA_VIT_H_14,
            img)

        B = img.shape[0]
        h, w = height // 8, width // 8
        if img.shape[-2:] != (height, width):
            img = jax.image.resize(img, (B, 3, height, width), "cubic")
        # first pixel frame + zeros through the VAE -> F latent frames
        frames = jnp.concatenate(
            [img[:, None],
             jnp.zeros((B, (num_frames - 1) * 4, 3, height, width),
                       img.dtype)], axis=1)
        z = vae_mod.encode(self.vae_params, self.vae_cfg,
                           frames.transpose(0, 1, 3, 4, 2))
        z = z.transpose(0, 1, 4, 2, 3)               # [B, F, 16, h, w]
        # 4-channel temporal mask: first latent frame's 4 sub-slots = 1
        # (utils/conditioning.py:142-148 repeat_interleave packing)
        mask = jnp.zeros((B, num_frames, 4, h, w), z.dtype).at[:, 0].set(1.0)
        return clip_fea, jnp.concatenate([mask, z], axis=2)

    def build_conditioning(self, dwpose_data: jax.Array,
                           first_frame: Optional[jax.Array] = None,
                           random_ref_dwpose: Optional[jax.Array] = None,
                           num_frames: int = 21, height: int = 480,
                           width: int = 832,
                           rng: Optional[jax.Array] = None,
                           pose_drop_prob: Optional[float] = None) -> dict:
        """The reference build_conditioning (utils/conditioning.py:157-182):
        pose tokens + image y + randomref bias, with condition dropout
        (dropped samples zero add_condition and lose the randomref term,
        keeping the bare image y)."""
        drop = self.drop_prob if pose_drop_prob is None else pose_drop_prob
        x = prepare_dwpose_input(dwpose_data)
        emb = dwpose_embedding(self.dwpose_params, x)   # [B, 5120, F, h', w']
        B, C = emb.shape[:2]
        # 'b c f h w -> b (f h w) c' (utils/conditioning.py:169)
        add_condition = emb.transpose(0, 2, 3, 4, 1).reshape(B, -1, C)

        out = {"add_condition": add_condition}
        image_y = None
        if first_frame is not None:
            if self.clip_params is None or self.vae_params is None:
                raise ValueError(
                    "first_frame conditioning needs clip_params and "
                    "vae_params on the PoseImageConditioner (the image y "
                    "is CLIP tokens + a VAE first-frame latent, reference "
                    "utils/conditioning.py:124-156) — refusing to silently "
                    "drop the image")
            clip_fea, image_y = self.encode_image(first_frame, num_frames,
                                                  height, width)
            out["clip_fea"] = clip_fea

        randomref = None
        if random_ref_dwpose is not None and self.randomref_params is not None:
            ref = random_ref_dwpose
            if ref.ndim == 4 and ref.shape[-1] == 3:    # [B, H, W, 3] u8
                ref = ref.transpose(0, 3, 1, 2)
            randomref = randomref_embedding(
                self.randomref_params, ref.astype(jnp.float32) / 255.0)

        y = image_y
        if y is not None and randomref is not None:
            y = y + randomref[:, None]                  # broadcast frames
        elif randomref is not None:
            # no image: the 20-ch randomref alone, repeated per frame
            # (same contract as the inference pipeline,
            # pipelines/causal_diffusion_inference.py randomref-only path)
            y = jnp.broadcast_to(
                randomref[:, None],
                (B, num_frames) + randomref.shape[1:]).astype(
                    randomref.dtype)

        if drop > 0 and rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - drop, (B,))
            out["add_condition"] = jnp.where(
                keep[:, None, None], out["add_condition"],
                jnp.zeros_like(out["add_condition"]))
            if y is not None:
                # dropped samples keep the bare image y (reference
                # :175-176); with no image that means zeros
                base = image_y if image_y is not None else jnp.zeros_like(y)
                y = jnp.where(keep[:, None, None, None, None], y, base)

        if y is not None:
            out["y"] = y
        return out
