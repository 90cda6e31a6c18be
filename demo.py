"""Streaming GUI demo CLI (reference demo.py): block-by-block generation
pushed to the browser over WebSocket.

Runtime toggles mirror the reference (:242-301): --quantize (the FP8
toggle, here int8 weight-only), --taehv (tiny fast VAE), fps slider in
the UI.  torch.compile's role is played by jax.jit, always on.

Usage:
  python demo.py --config_path configs/self_forcing_dmd.yaml --port 5001
  python demo.py --config_path configs/tiny_test.yaml          # CPU smoke
"""
from __future__ import annotations

import argparse
import os
import zlib

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/self_forcing_dmd.yaml")
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--port", type=int, default=5001)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--quantize", action="store_true",
                        help="quantized linears (mode per --quantize_mode "
                             "or the chip registry, ops/chip.py; the "
                             "reference FP8 toggle, demo.py:277-283)")
    parser.add_argument("--quantize_mode", type=str, default=None,
                        choices=["w8a8", "w8", "fp8"],
                        help="w8a8 = dynamic-activation int8 on the MXU "
                             "int8 path (2.17x); w8 = weight-only; "
                             "fp8 = dynamic e4m3 (v6e MXU); "
                             "default = the detected chip's registry "
                             "entry (ops/chip.py)")
    parser.add_argument("--taehv", action="store_true",
                        help="TAEHV fast decoder (demo.py:269-275)")
    parser.add_argument("--taehv_checkpoint", type=str,
                        default="checkpoints/taew2_1.pth")
    parser.add_argument("--fps", type=float, default=6.0)
    parser.add_argument("--warmup", action="store_true",
                        help="compile the serving path before accepting "
                             "requests (one throwaway 1-block generation; "
                             "first request then streams immediately — "
                             "the torch.compile-warmup analog)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from self_forcing_tpu.config import load_config
    from self_forcing_tpu.models.wan import dit, vae as vae_mod
    from self_forcing_tpu.models.wan.configs import (WAN_1_3B, WAN_TINY,
                                                     LATENT_HEIGHT,
                                                     LATENT_WIDTH)
    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline)
    from self_forcing_tpu.serving.demo_server import DemoApp

    config = load_config(args.config_path,
                         os.path.join(os.path.dirname(args.config_path),
                                      "default_config.yaml"))
    size = str(getattr(config, "model_size", "1.3b")).lower()
    model_dir = getattr(config, "model_dir", "wan_models")

    if size == "tiny":
        cfg = WAN_TINY
        params = dit.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        # tiny VAE widened to the DiT's 16 latent channels
        vae_cfg = vae_mod.VAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 2, 2),
                                    num_res_blocks=1)
        vae_params = vae_mod.init_params(jax.random.PRNGKey(1), vae_cfg)
        H = W = 8
        F = int(getattr(config, "num_frames", 3))
        encode = lambda prompts: jnp.stack([
            jax.random.normal(jax.random.PRNGKey(
                zlib.crc32(p.encode()) % 2 ** 31),
                              (512, cfg.text_dim)) for p in prompts])
    else:
        from self_forcing_tpu.runtime import load_wan_models
        cfg = WAN_1_3B
        # t5_on_host: the serving resident set (DiT + 9.8 GB KV cache +
        # VAE) leaves no HBM for a resident 11 GB T5 on a 16 GB chip;
        # prompts encode by streaming weights per layer (the reference
        # demo's DynamicSwapInstaller low-memory mode)
        models = load_wan_models(model_dir, model_cfg=cfg,
                                 checkpoint_path=args.checkpoint_path,
                                 t5_on_host=True)
        params, vae_params, vae_cfg = (models.generator, models.vae_params,
                                       models.vae_cfg)
        encode = models.encode_text
        H, W, F = LATENT_HEIGHT, LATENT_WIDTH, 21

    # yaml model_kwargs overlay (local_attn_size/sink_size/... — the
    # reference wrapper's kwargs surface; enables windowed streaming)
    from self_forcing_tpu.models.wan.configs import apply_model_kwargs
    cfg = apply_model_kwargs(cfg, config)
    pipeline = CausalInferencePipeline(config, params, cfg)

    # int8 param tree built lazily on the first quantized request
    # (per-request toggle, reference demo.py:581-584 enable_fp8)
    def quantized_params_fn():
        from self_forcing_tpu.ops.quant import quantize_dit_params
        min_dim = 64 if size == "tiny" else 512
        mode = args.quantize_mode
        if mode is None:
            from self_forcing_tpu.ops.chip import chip_defaults
            mode = chip_defaults()["matmul_quant"]
        print(f"[demo] quantizing DiT linears ({mode})")
        return quantize_dit_params(params, mode=mode,
                                   min_dim=min_dim)

    # ---- chunk decoders: streaming Wan VAE always; TAEHV when available
    state = {"cache": None}

    def reset_decoder():
        state["cache"] = None

    def decode_chunk(latents):
        z = latents.astype(jnp.float32).transpose(0, 1, 3, 4, 2)
        if state["cache"] is None:
            state["cache"] = vae_mod.init_decoder_cache(
                vae_params, vae_cfg, z.shape[0], z.shape[2], z.shape[3],
                jnp.float32)
            out0, state["cache"] = vae_mod.decode_frame(
                vae_params, vae_cfg, z[:, :1], state["cache"], True)
            outs = [out0]
            rest = range(1, z.shape[1])
        else:
            outs, rest = [], range(z.shape[1])
        for i in rest:
            y, state["cache"] = vae_mod.decode_frame(
                vae_params, vae_cfg, z[:, i:i + 1], state["cache"],
                False)
            outs.append(y)
        px = jnp.clip(jnp.concatenate(outs, axis=1) * 0.5 + 0.5, 0, 1)
        # device-side u8; DemoApp fetches after dispatching the next
        # block (see demo_server._generate lookahead)
        return (px[0] * 255).astype(jnp.uint8)

    taehv_decoder = None
    tae_params = None
    if os.path.exists(args.taehv_checkpoint):
        from self_forcing_tpu.models import taehv as taehv_mod
        from self_forcing_tpu.utils.checkpoints import load_torch_state_dict
        tae_params = taehv_mod.convert_taehv_state_dict(
            load_torch_state_dict(args.taehv_checkpoint))
    elif size == "tiny":  # CPU smoke: random-init fast decoder
        from self_forcing_tpu.models import taehv as taehv_mod
        tae_params = taehv_mod.init_decoder_params(jax.random.PRNGKey(2))
    if tae_params is not None:
        streamer = taehv_mod.TAEHVStreamer(tae_params, overlap=3)

        def decode_chunk_tae(latents):
            px = streamer.decode_chunk(latents.astype(jnp.float32))
            # u8 cast ON DEVICE and no fetch here: DemoApp pulls the pixels
            # one block later (lookahead), and u8 is 4x fewer bytes through
            # the device transport than f32
            return (jnp.clip(px[0].transpose(0, 2, 3, 1), 0, 1)
                    * 255).astype(jnp.uint8)

        taehv_decoder = (decode_chunk_tae, streamer.reset)

    app = DemoApp(pipeline, encode, decode_chunk,
                  latent_shape=(1, F, 16, H, W), fps=args.fps,
                  reset_decoder_fn=reset_decoder,
                  taehv_decoder=taehv_decoder,
                  quantized_params_fn=quantized_params_fn,
                  default_taehv=args.taehv,
                  default_quantize=args.quantize)
    if args.warmup:
        # trace+compile the per-block programs and the chunk decoder with
        # a throwaway generation so the first real request streams at
        # steady-state speed (first jit at 1.3B takes minutes)
        import time as _time
        t0 = _time.perf_counter()
        print("[demo] warmup: compiling serving path...")
        # bf16 like DemoApp._generate's noise, so the warmup traces the
        # exact serving programs
        wnoise = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, F, 16, H, W)), jnp.bfloat16)
        wctx = encode(["warmup"])
        if reset_decoder is not None:
            reset_decoder()
        # consume the WHOLE stream: the global path compiles one
        # denoise/refresh specialization per block (static_kv_hi), so a
        # partial warmup would leave later blocks compiling during the
        # first real request
        for blk in pipeline.stream(wnoise, wctx):
            np.asarray(decode_chunk(blk))
        if reset_decoder is not None:
            reset_decoder()
        print(f"[demo] warmup done in {_time.perf_counter() - t0:.1f}s")
    app.serve(args.host, args.port)


if __name__ == "__main__":
    main()
