"""Inference CLI (reference inference.py): batch T2V/I2V over a prompt
file, prompts sharded across JAX processes (DistributedSampler + NCCL
becomes process-indexed slicing).

Pipeline selection matches the reference (:62-67): configs with
denoising_step_list use the few-step CausalInferencePipeline; otherwise
the 50-step CausalDiffusionInferencePipeline.

Usage:
  python inference.py --config_path configs/self_forcing_dmd.yaml \
      --checkpoint_path checkpoints/self_forcing_dmd.pt \
      --data_path prompts/MovieGenVideoBench.txt --output_folder videos/
"""
from __future__ import annotations

import argparse
import os
import zlib

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--output_folder", type=str, default="videos/out")
    parser.add_argument("--num_output_frames", type=int, default=21,
                        help="latent frames (21 -> 81 pixel frames)")
    parser.add_argument("--use_ema", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save_with_index", action="store_true")
    parser.add_argument("--i2v", action="store_true",
                        help="image-to-video eval over a "
                             "TextImagePairDataset directory (reference "
                             "inference.py:83-150)")
    parser.add_argument("--dwpose_path", type=str, default=None,
                        help=".npz with dwpose_data [3,F_px,H,W] u8 and "
                             "optional random_ref_dwpose [H,W,3] u8 for "
                             "the pose-conditioned diffusion pipeline")
    parser.add_argument("--tp", type=int, default=0,
                        help="tensor-parallel degree for the few-step "
                             "pipeline (Megatron-style head/ffn sharding "
                             "over the first N devices; the Wan-14B "
                             "single-host path — parallel/tensor.py)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from self_forcing_tpu.config import load_config
    from self_forcing_tpu.data.datasets import TextDataset
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import (WAN_1_3B, WAN_TINY,
                                                     LATENT_HEIGHT,
                                                     LATENT_WIDTH)
    from self_forcing_tpu.models.wan import vae as vae_mod

    config = load_config(args.config_path,
                         os.path.join(os.path.dirname(args.config_path),
                                      "default_config.yaml"))
    size = str(getattr(config, "model_size", "1.3b")).lower()
    model_dir = getattr(config, "model_dir", "wan_models")

    # ---- models
    text_encoder = None
    vae_params = None
    vae_cfg = vae_mod.WAN_VAE
    if size == "tiny":
        cfg = WAN_TINY
        params = dit.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.float32)
        # tiny VAE widened to the DiT's 16 latent channels
        vae_cfg = vae_mod.VAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 2, 2),
                                    num_res_blocks=1)
        vae_params = vae_mod.init_params(jax.random.PRNGKey(1), vae_cfg)
        H = W = 8
        encode = lambda prompts: jnp.stack([
            jax.random.normal(jax.random.PRNGKey(
                zlib.crc32(p.encode()) % 2 ** 31),
                              (512, cfg.text_dim)) for p in prompts])
    else:
        from self_forcing_tpu.runtime import load_wan_models
        cfg = WAN_1_3B
        models = load_wan_models(
            model_dir, causal=True, model_cfg=cfg,
            checkpoint_path=args.checkpoint_path,
            checkpoint_key="generator_ema" if args.use_ema else "generator")
        params = models.generator
        vae_params, vae_cfg = models.vae_params, models.vae_cfg
        encode = models.encode_text
        H, W = LATENT_HEIGHT, LATENT_WIDTH

    # yaml model_kwargs overlay (local_attn_size/sink_size/... — the
    # reference wrapper's kwargs surface; enables windowed streaming)
    from self_forcing_tpu.models.wan.configs import apply_model_kwargs
    cfg = apply_model_kwargs(cfg, config)

    few_step = bool(getattr(config, "denoising_step_list", None))

    # ---- pose inputs (diffusion pipeline only; the reference CLI passes
    # these kwargs to the few-step pipeline too, which TypeErrors —
    # SURVEY.md §3.1 fork caveat; here that misuse raises cleanly)
    dwpose_data = random_ref = None
    if args.dwpose_path:
        if few_step:
            raise ValueError(
                "--dwpose_path needs the 50-step diffusion pipeline "
                "(a config without denoising_step_list)")
        pose = np.load(args.dwpose_path)
        dwpose_data = jnp.asarray(pose["dwpose_data"])[None]
        if "random_ref_dwpose" in pose:
            random_ref = jnp.asarray(pose["random_ref_dwpose"])[None]

    # ---- pipeline choice (reference inference.py:62-67)
    if few_step:
        from self_forcing_tpu.pipelines.causal_inference import (
            CausalInferencePipeline)
        mesh = None
        if args.tp and args.tp > 1:
            from self_forcing_tpu.parallel import tensor as tpmod
            if cfg.num_heads % args.tp or cfg.ffn_dim % args.tp:
                raise SystemExit(
                    f"--tp {args.tp} does not divide num_heads="
                    f"{cfg.num_heads} / ffn_dim={cfg.ffn_dim}")
            if len(jax.devices()) < args.tp:
                raise SystemExit(
                    f"--tp {args.tp} needs {args.tp} devices, have "
                    f"{len(jax.devices())}")
            mesh = tpmod.tp_mesh(args.tp)
            params = tpmod.shard_params_tp(params, mesh)
        pipeline = CausalInferencePipeline(
            config, params, cfg, vae_params=vae_params, vae_cfg=vae_cfg,
            mesh=mesh)
    else:
        if args.tp and args.tp > 1:
            raise SystemExit("--tp is supported on the few-step pipeline "
                             "(configs with denoising_step_list)")
        from self_forcing_tpu.pipelines.causal_diffusion_inference import (
            CausalDiffusionInferencePipeline)
        dwpose_params = randomref_params = None
        if dwpose_data is not None:
            from self_forcing_tpu import conditioning as cond_mod
            pose_path = getattr(config, "pose_weights_path", None)
            if pose_path and os.path.exists(str(pose_path)):
                from self_forcing_tpu.utils import checkpoints as ckpt
                dwpose_params, randomref_params = \
                    cond_mod.load_pose_embedding_weights(
                        ckpt.load_torch_state_dict(str(pose_path)))
            elif size == "tiny":
                dwpose_params = cond_mod.init_dwpose_params(
                    jax.random.PRNGKey(7))
                randomref_params = cond_mod.init_randomref_params(
                    jax.random.PRNGKey(8))
            else:
                raise ValueError(
                    "--dwpose_path given but config.pose_weights_path is "
                    "missing (UniAnimate LoRA checkpoint with the "
                    "dwpose_embedding. weights)")
        pipeline = CausalDiffusionInferencePipeline(
            config, params, cfg, vae_params=vae_params, vae_cfg=vae_cfg,
            dwpose_params=dwpose_params, randomref_params=randomref_params)

    # ---- prompts, sharded per process (reference :96-99)
    data_path = args.data_path or str(getattr(config, "data_path", ""))
    if args.i2v:
        from self_forcing_tpu.data.datasets import TextImagePairDataset
        dataset = TextImagePairDataset(data_path)
    else:
        dataset = TextDataset(data_path)
    rank, world = jax.process_index(), jax.process_count()
    os.makedirs(args.output_folder, exist_ok=True)

    F = int(args.num_output_frames)
    # validate the frame arithmetic up front: the pipelines consume frames
    # in blocks of num_frame_per_block, with the first frame independent
    # when independent_first_frame (the reference CLI lets a bad
    # combination die on a bare assert deep in the pipeline; a 1-frame
    # i2v initial latent additionally requires independent_first_frame)
    nb = int(getattr(config, "num_frame_per_block", 1))
    iff = bool(getattr(config, "independent_first_frame", False))
    n_gen = F - 1 if args.i2v else (F - 1 if iff else F)
    if args.i2v and not iff:
        raise SystemExit(
            "--i2v encodes the image as one independent first latent "
            "frame, which requires independent_first_frame: true in the "
            "config (got false)")
    if n_gen % nb != 0:
        raise SystemExit(
            f"--num_output_frames {F} is not reachable with "
            f"num_frame_per_block={nb} (independent_first_frame={iff}, "
            f"i2v={args.i2v}): {n_gen} generated frames must be a "
            f"multiple of {nb} — try {F - n_gen % nb} or "
            f"{F + nb - n_gen % nb} output frames")
    # identical for every prompt: one T5 forward, not one per dataset row
    neg = encode([str(getattr(config, "negative_prompt", ""))]) \
        if not few_step else None
    for idx in range(rank, len(dataset), world):
        item = dataset[idx]
        prompt = item["prompts"]
        context = encode([prompt])
        initial_latent = None
        n_noise = F
        if args.i2v:
            # encode the image as the first latent frame; generate F-1
            # more (reference inference.py:136-150)
            img = jnp.asarray(item["image"], jnp.float32)  # [H0,W0,3] [-1,1]
            img = jax.image.resize(img, (H * 8, W * 8, 3), "cubic")
            z = vae_mod.encode(vae_params, vae_cfg, img[None, None])
            initial_latent = z.transpose(0, 1, 4, 2, 3)  # [1,1,16,h,w]
            n_noise = F - 1
        noise = jax.random.normal(
            jax.random.PRNGKey(args.seed + idx), (1, n_noise, 16, H, W),
            jnp.float32)
        if neg is not None:
            video = pipeline.inference(noise, context=context,
                                       neg_context=neg,
                                       initial_latent=initial_latent,
                                       dwpose_data=dwpose_data,
                                       random_ref_dwpose=random_ref)
        else:
            video = pipeline.inference(noise, context=context,
                                       initial_latent=initial_latent)
        # [B, T, 3, H, W] in [0,1] -> mp4 at 16 fps (reference :196)
        frames = (np.asarray(video[0]).transpose(0, 2, 3, 1)
                  * 255).astype(np.uint8)
        name = f"output_{idx:03d}.mp4" if args.save_with_index else \
            f"{prompt[:100].replace('/', '_')}.mp4"
        out_path = os.path.join(args.output_folder, name)
        from self_forcing_tpu.utils.video_io import save_video
        save_video(frames, out_path, fps=16)
        print(f"[{rank}] wrote {out_path}")


if __name__ == "__main__":
    main()
