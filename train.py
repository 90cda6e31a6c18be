"""Training CLI (reference train.py): dispatches on config.trainer in
{score_distillation, gan, ode, diffusion}.

Usage:
  python train.py --config_path configs/self_forcing_dmd.yaml \
      [--logdir logs/run1] [--no_save] [--disable-wandb] [--max_steps N]

Differences from the reference launcher (README.md:87-94): no torchrun —
multi-host runs call `jax.distributed.initialize()` when JAX_COORDINATOR
is set; single-host runs need nothing.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_models(config, causal_dtype):
    """Construct generator/critic/teacher params: from checkpoints when the
    model dir exists, random init otherwise (tiny/test runs)."""
    import jax
    import jax.numpy as jnp
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import (WAN_1_3B, WAN_14B,
                                                     WAN_TINY)
    size = str(getattr(config, "model_size", "1.3b")).lower()
    cfg = {"1.3b": WAN_1_3B, "14b": WAN_14B, "tiny": WAN_TINY}[size]
    from self_forcing_tpu.models.wan.configs import apply_model_kwargs
    cfg = apply_model_kwargs(cfg, config)

    model_dir = getattr(config, "model_dir", "wan_models")
    gen_ckpt = getattr(config, "generator_ckpt", None)
    key = jax.random.PRNGKey(int(getattr(config, "seed", 0)))
    if size != "tiny" and os.path.isdir(model_dir):
        from self_forcing_tpu.runtime import load_dit_params
        generator = load_dit_params(
            model_dir, cfg,
            gen_ckpt if gen_ckpt and os.path.exists(gen_ckpt) else None,
            checkpoint_key="generator", dtype=causal_dtype)
        fake = load_dit_params(model_dir, cfg, dtype=causal_dtype)
        real = load_dit_params(model_dir, cfg, dtype=causal_dtype)
    else:
        if size != "tiny":
            print(f"[train] no weights at {model_dir}; random init")
        generator = dit.init_params(key, cfg, dtype=causal_dtype)
        fake = dit.init_params(jax.random.fold_in(key, 1), cfg,
                               dtype=causal_dtype, causal=False)
        real = dit.init_params(jax.random.fold_in(key, 2), cfg,
                               dtype=causal_dtype, causal=False)
    return cfg, generator, fake, real


def setup_mesh(config, generator, fake, real):
    """FSDP-style parameter sharding over a ('dp','fsdp') mesh when more
    than one device is available — the reference wires FSDP in-trainer
    (trainer/distillation.py:74-101, sharding_strategy 'hybrid_full');
    here GSPMD shardings are applied once at setup and XLA inserts the
    all-gathers/reduce-scatters.  Returns (mesh or None, sharded params)."""
    import jax
    from self_forcing_tpu.parallel import create_mesh, shard_params
    strategy = str(getattr(config, "sharding_strategy", "hybrid_full"))
    n = len(jax.devices())
    if n == 1 or strategy in ("none", "no_shard"):
        return None, generator, fake, real
    # hybrid: replicate over 'dp' (DCN / hosts), shard over 'fsdp' (ICI).
    # 'sp' > 1 additionally runs the frozen teacher sequence-parallel
    # (ring attention; the 14B-teacher path — trainer_distillation.py).
    dp = int(getattr(config, "dp_size", 0)) or (
        jax.process_count() if strategy.startswith("hybrid")
        and n % jax.process_count() == 0 else 1)
    sp = int(getattr(config, "sp_size", 1)) or 1
    mesh = create_mesh(dp=dp, sp=sp, fsdp=n // (dp * sp))
    min_size = int(getattr(config, "fsdp_min_param_size", 2 ** 16))
    generator = shard_params(generator, mesh, min_size=min_size)
    fake = shard_params(fake, mesh, min_size=min_size)
    real = shard_params(real, mesh, min_size=min_size)
    return mesh, generator, fake, real


def shard_batch(batch: dict, mesh):
    """Shard array batch entries over the mesh's data axes (the
    DistributedSampler equivalent, parallel/mesh.py data_sharding)."""
    if mesh is None:
        return batch
    import jax
    from self_forcing_tpu.parallel.mesh import data_sharding
    def put(v):
        if not (hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1):
            return v
        if v.shape[0] % (mesh.shape["dp"] * mesh.shape["fsdp"]) == 0:
            return jax.device_put(v, data_sharding(mesh))
        if v.shape[0] % mesh.shape["dp"] == 0:
            return jax.device_put(v, data_sharding(mesh, "dp"))
        return v
    return {k: put(v) for k, v in batch.items()}


def make_context_fn(config, cfg):
    """Text contexts: real T5 when weights exist, deterministic pseudo
    embeddings otherwise (keeps tiny/CI runs self-contained)."""
    import jax
    import jax.numpy as jnp
    model_dir = getattr(config, "model_dir", "wan_models")
    t5_path = os.path.join(model_dir, "models_t5_umt5-xxl-enc-bf16.pth")
    if os.path.exists(t5_path):
        from self_forcing_tpu.runtime import load_wan_models
        # T5 only: loading the DiT here duplicated the multi-GB generator
        # the trainer already holds (minutes of convert on this host)
        models = load_wan_models(model_dir, load_vae=False, load_dit=False)
        return models.encode_text

    def pseudo(prompts):
        # zlib.crc32, not hash(): python string hashing is salted per
        # process, so replicas would see different pseudo embeddings
        import zlib
        keys = [jax.random.PRNGKey(zlib.crc32(p.encode()) % (2 ** 31))
                for p in prompts]
        return jnp.stack([jax.random.normal(k, (512, cfg.text_dim),
                                            jnp.float32) for k in keys])
    return pseudo


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--logdir", type=str, default="logs/run")
    parser.add_argument("--no_save", action="store_true")
    parser.add_argument("--no_visualize", action="store_true")
    parser.add_argument("--disable-wandb", action="store_true")
    parser.add_argument("--wandb-save-dir", type=str, default="")
    parser.add_argument("--max_steps", type=int, default=100)
    args = parser.parse_args()

    if os.environ.get("JAX_COORDINATOR"):
        import jax
        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp
    from self_forcing_tpu.config import load_config
    from self_forcing_tpu.utils.metrics import MetricsLogger
    from self_forcing_tpu.utils.misc import set_seed

    config = load_config(args.config_path,
                         os.path.join(os.path.dirname(args.config_path),
                                      "default_config.yaml"))
    set_seed(int(getattr(config, "seed", 0)))
    is_main = jax.process_index() == 0
    # wandb wiring matches the reference (trainer/distillation.py:48-57):
    # entity/project from the config, run name = config file stem, save
    # dir from the CLI; MetricsLogger falls back to JSONL when wandb is
    # missing or unconfigured
    wandb_kwargs = {
        "entity": getattr(config, "wandb_entity", None),
        "project": getattr(config, "wandb_project", None),
        "name": os.path.basename(args.config_path).rsplit(".", 1)[0],
        "dir": args.wandb_save_dir or None,
    }
    logger = MetricsLogger(
        args.logdir, disable_wandb=args.disable_wandb,
        wandb_kwargs={k: v for k, v in wandb_kwargs.items() if v},
        is_main=is_main)

    trainer_kind = str(getattr(config, "trainer", "score_distillation"))
    dtype = jnp.bfloat16 if getattr(config, "mixed_precision", False) \
        else jnp.float32
    cfg, generator, fake, real = build_models(config, dtype)
    mesh, generator, fake, real = setup_mesh(config, generator, fake, real)
    if mesh is not None and is_main:
        print(f"[train] mesh dp={mesh.shape['dp']} "
              f"fsdp={mesh.shape['fsdp']} over {len(jax.devices())} devices")
    context_fn = make_context_fn(config, cfg)

    shape = list(getattr(config, "image_or_video_shape", [1, 21, 16, 60, 104]))
    B = int(getattr(config, "batch_size", shape[0]))
    shape[0] = B

    # ---- data
    data_path = str(getattr(config, "data_path", ""))
    batches = None
    if trainer_kind == "ode" and os.path.exists(data_path):
        from self_forcing_tpu.data.datasets import ODERegressionDataset
        from self_forcing_tpu.data.loader import DataLoader
        ds = ODERegressionDataset(data_path)
        batches = iter(DataLoader(ds, B, infinite=True))
    elif trainer_kind == "score_distillation" \
            and getattr(config, "use_pose_conditioning", False) \
            and os.path.isdir(data_path):
        # pose distillation reads the sharded pose dataset (reference
        # trainer/distillation.py:141-147 PoseShardingLMDBDataset branch)
        from self_forcing_tpu.data.datasets import PoseShardingDataset
        from self_forcing_tpu.data.loader import DataLoader
        ds = PoseShardingDataset(data_path)
        batches = iter(DataLoader(ds, B, infinite=True))
    elif trainer_kind in ("diffusion", "gan") and os.path.isdir(data_path):
        from self_forcing_tpu.data.datasets import ShardingDataset
        from self_forcing_tpu.data.loader import DataLoader
        ds = ShardingDataset(data_path)
        batches = iter(DataLoader(ds, B, infinite=True))
    elif os.path.exists(data_path):
        from self_forcing_tpu.data.datasets import TextDataset
        from self_forcing_tpu.data.loader import DataLoader
        ds = TextDataset(data_path)
        batches = iter(DataLoader(ds, B, infinite=True))

    rng = np.random.default_rng(int(getattr(config, "seed", 0)))

    def next_batch():
        if batches is not None:
            b = next(batches)
        else:
            b = {"prompts": [f"placeholder prompt {rng.integers(1000)}"
                             for _ in range(B)]}
        out = {}
        if "prompts" in b:
            out["context"] = context_fn(list(b["prompts"]))
        for k in ("dwpose_data", "random_ref_dwpose", "first_frame"):
            if k in b:
                out[k] = np.asarray(b[k])
        if "ode_latent" in b:
            out["ode_latent"] = jnp.asarray(b["ode_latent"])
            out["latents"] = out["ode_latent"][:, -1]
        elif trainer_kind in ("diffusion", "gan"):
            out["latents"] = jax.random.normal(
                jax.random.PRNGKey(int(rng.integers(2 ** 31))),
                tuple(shape), jnp.float32)
        return out

    # ---- trainer dispatch (reference train.py:33-41)
    if trainer_kind == "score_distillation":
        from self_forcing_tpu.training.trainer_distillation import (
            ScoreDistillationTrainer)
        neg = context_fn([str(getattr(config, "negative_prompt", ""))] * B)
        # image conditioning inside the conditioner (first_frame -> CLIP
        # tokens + masked VAE latent y) and >21-frame rollout re-encodes
        # need the VAE and CLIP towers (reference trainer/distillation.py:
        # 106-122 passes self.vae + image encoder into the conditioner)
        pose_extra = {}
        if getattr(config, "use_pose_conditioning", False):
            model_dir = getattr(config, "model_dir", "wan_models")
            from self_forcing_tpu.runtime import (load_clip_vision,
                                                  load_wan_models)
            m = load_wan_models(model_dir, load_t5=False, load_dit=False)
            clip_params, clip_cfg = load_clip_vision(model_dir)
            pose_extra = dict(vae_params=m.vae_params, vae_cfg=m.vae_cfg,
                              clip_params=clip_params, clip_cfg=clip_cfg)
            if is_main and (m.vae_params is None or clip_params is None):
                print("[train] pose conditioning without "
                      f"{'VAE' if m.vae_params is None else ''}"
                      f"{'/' if m.vae_params is None and clip_params is None else ''}"
                      f"{'CLIP' if clip_params is None else ''} weights: "
                      "first_frame image conditioning will raise if the "
                      "dataset provides images")
        trainer = ScoreDistillationTrainer(
            config, generator, fake, real, cfg, cfg, cfg, neg, mesh=mesh,
            **pose_extra)
    elif trainer_kind == "gan":
        from self_forcing_tpu.training.trainer_gan import GANTrainer
        trainer = GANTrainer(config, generator, fake, cfg, cfg, mesh=mesh)
    elif trainer_kind == "ode":
        from self_forcing_tpu.training.trainer_ode import ODETrainer
        trainer = ODETrainer(config, generator, cfg,
                             visualize=not args.no_visualize, mesh=mesh)
    elif trainer_kind == "diffusion":
        from self_forcing_tpu.training.trainer_diffusion import (
            DiffusionTrainer)
        trainer = DiffusionTrainer(config, generator, cfg, mesh=mesh)
    else:
        raise ValueError(f"unknown trainer {trainer_kind!r}")

    # ---- periodic decoded-video visualization (reference
    # trainer/ode.py:190-209 logs input/output/ground-truth triplets)
    vae_wrapper = None
    model_dir = getattr(config, "model_dir", "wan_models")
    if (not args.no_visualize and is_main
            and hasattr(trainer, "last_visual") and os.path.isdir(model_dir)):
        from self_forcing_tpu.runtime import load_wan_models
        from self_forcing_tpu.wrappers import WanVAEWrapper
        models = load_wan_models(model_dir, load_dit=False, load_t5=False)
        if models.vae_params is not None:
            vae_wrapper = WanVAEWrapper(models.vae_params, models.vae_cfg)
    visualize_every = int(getattr(config, "visualize_every", 100))

    def visualize(step):
        if vae_wrapper is None or trainer.last_visual is None:
            return
        for name, lat in trainer.last_visual.items():
            px = vae_wrapper.decode_to_pixel(jnp.asarray(lat))
            video = np.asarray(px[0].transpose(0, 2, 3, 1)) * 0.5 + 0.5
            logger.log_video(name, video, step)

    log_iters = int(getattr(config, "log_iters", 50))
    for step in range(args.max_steps):
        t0 = time.time()
        log = trainer.train_step(shard_batch(next_batch(), mesh))
        log["step_time_s"] = round(time.time() - t0, 3)
        logger.log(log, step=step)
        if step % visualize_every == 0:
            visualize(step)
        if is_main and (step % 10 == 0 or step == args.max_steps - 1):
            brief = {k: round(v, 5) for k, v in log.items()
                     if isinstance(v, float)}
            print(f"[{step}] {brief}")
        if not args.no_save and step and step % log_iters == 0 and is_main:
            trainer.save(os.path.abspath(
                os.path.join(args.logdir,
                             f"checkpoint_model_{step:06d}")))
    if not args.no_save and is_main:
        trainer.save(os.path.abspath(os.path.join(args.logdir, "final")))
    logger.close()


if __name__ == "__main__":
    main()
