"""Generate ODE-regression training pairs with the bidirectional teacher
(reference scripts/generate_ode_pairs.py).

48-step CFG sampling per prompt, snapshotting the trajectory at steps
[0, 12, 24, 36, final] (reference :105-108); prompts are sharded across
JAX processes (the torchrun/NCCL rank loop becomes jax.process_index()).
Saves one .npz per prompt: {prompt: latents [1, 5, 21, 16, H, W] fp16}.

Usage:
  python scripts/generate_ode_pairs.py --output_folder PAIRS \
      --caption_path prompts.txt --model_dir CKPTS [--guidance_scale 6.0]
"""
import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_folder", type=str, required=True)
    parser.add_argument("--caption_path", type=str, required=True)
    parser.add_argument("--guidance_scale", type=float, default=6.0)
    parser.add_argument("--model_dir", type=str, default="wan_models")
    parser.add_argument("--num_steps", type=int, default=48)
    parser.add_argument("--snapshots", type=int, nargs="+",
                        default=[0, 12, 24, 36, -1])
    parser.add_argument("--latent_shape", type=int, nargs=5,
                        default=[1, 21, 16, 60, 104])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_1_3B
    from self_forcing_tpu.models.wan.rope import RopeTables
    from self_forcing_tpu.runtime import load_wan_models
    from self_forcing_tpu.scheduler import FlowMatchScheduler
    from self_forcing_tpu.data.datasets import TextDataset

    models = load_wan_models(args.model_dir, causal=False)
    params, cfg = models.generator, models.generator_cfg
    rope = RopeTables.create(cfg.head_dim)
    scheduler = FlowMatchScheduler.create(args.num_steps, shift=8.0,
                                          extra_one_step=True)
    dataset = TextDataset(args.caption_path)
    os.makedirs(args.output_folder, exist_ok=True)

    neg = models.encode_text([models.negative_prompt])

    @jax.jit
    def cfg_x0_step(params, latents, t_val, ctx, neg_ctx, tid):
        B, F = latents.shape[:2]
        t = jnp.full((B, F), t_val, jnp.float32)
        flat = lambda a: a.reshape((B * F,) + a.shape[2:])
        flow_c = dit.forward_train(params, cfg, latents, t, ctx, None, rope,
                                   remat=False)
        flow_u = dit.forward_train(params, cfg, latents, t, neg_ctx, None,
                                   rope, remat=False)
        x0_c = scheduler.convert_flow_pred_to_x0(
            flat(flow_c), flat(latents), t.reshape(-1))
        x0_u = scheduler.convert_flow_pred_to_x0(
            flat(flow_u), flat(latents), t.reshape(-1))
        x0 = x0_u + args.guidance_scale * (x0_c - x0_u)
        flow = scheduler.convert_x0_to_flow_pred(x0, flat(latents),
                                                 t.reshape(-1))
        out = scheduler.step(flow, jnp.broadcast_to(t_val, (B * F,)),
                             flat(latents))
        return out.reshape(latents.shape)

    rank = jax.process_index()
    world = jax.process_count()
    timesteps = np.asarray(scheduler.timesteps)

    for index in range(math.ceil(len(dataset) / world)):
        prompt_index = index * world + rank
        if prompt_index >= len(dataset):
            continue
        prompt = dataset[prompt_index]["prompts"]
        ctx = models.encode_text([prompt])
        key = jax.random.PRNGKey(args.seed + prompt_index)
        latents = jax.random.normal(key, args.latent_shape, jnp.float32)

        trajectory = []
        for i, t_val in enumerate(timesteps):
            trajectory.append(np.asarray(latents, np.float16))
            latents = cfg_x0_step(params, latents, jnp.float32(t_val), ctx,
                                  neg, i)
        trajectory.append(np.asarray(latents, np.float16))
        snaps = np.stack([trajectory[i] for i in args.snapshots], axis=1)

        np.savez(os.path.join(args.output_folder, f"{prompt_index:05d}.npz"),
                 prompt=prompt, latents=snaps)
        print(f"[{rank}] saved {prompt_index:05d} ({prompt[:40]}...)")


if __name__ == "__main__":
    main()
