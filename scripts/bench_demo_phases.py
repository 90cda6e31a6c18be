"""Phase-split the demo config: time denoise vs refresh vs TAEHV decode
per block (sync between phases; sync cost ~35ms/call noted)."""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WAN_1_3B
from self_forcing_tpu.pipelines.causal_inference import (
    CausalInferencePipeline, denoise_block, refresh_block)
from self_forcing_tpu.config import Config
from self_forcing_tpu.models import taehv as taehv_mod
from self_forcing_tpu.ops.quant import quantize_dit_params

cfg = dataclasses.replace(WAN_1_3B, num_frame_per_block=3)
cfg_q = dataclasses.replace(cfg, attn_quant="int8qk")
B, F, C, H, W = 1, 21, 16, 60, 104
key = jax.random.PRNGKey(0)
params = dit.init_params(key, cfg, dtype=jnp.bfloat16)
qp = quantize_dit_params(params, mode="w8a8")
args = Config({"denoising_step_list": [1000, 750, 500, 250],
               "warp_denoising_step": True, "timestep_shift": 8.0,
               "num_frame_per_block": 3, "independent_first_frame": False,
               "context_noise": 0})
pipe = CausalInferencePipeline(args, params, cfg)
context = jax.random.normal(jax.random.fold_in(key, 2), (B, 512, cfg.text_dim), jnp.bfloat16)
noise = jax.random.normal(jax.random.fold_in(key, 3), (B, F, C, H, W), jnp.bfloat16)
ctx_kv_q = dit.precompute_context(qp, cfg_q, context)
fs = (H // 2) * (W // 2)
tae = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                   taehv_mod.init_decoder_params(jax.random.fold_in(key, 7)))
tae_decode = jax.jit(taehv_mod.decode_video, static_argnames=("trim",))
nb = 3

def sync(x):
    return float(jnp.ravel(x)[0])

def run(report=False):
    cache = dit.init_kv_cache(cfg, B, fs, 21, jnp.bfloat16)
    cache = dit.reset_kv_cache(cache)
    streamer = taehv_mod.TAEHVStreamer(tae, overlap=3, decode_fn=tae_decode)
    rng = jax.random.PRNGKey(42)
    tden = tref = tdec = 0.0
    start = jnp.int32(0)
    for b in range(7):
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        blk, cache = denoise_block(qp, cfg_q, pipe.scheduler, pipe.rope,
                                   ctx_kv_q, cache, noise[:, b*nb:(b+1)*nb],
                                   k, pipe.denoising_step_list, start,
                                   static_kv_hi=b*nb*fs)
        sync(blk)
        t1 = time.perf_counter(); tden += t1 - t0
        px = streamer.decode_chunk(blk[:, :, :16].astype(jnp.bfloat16))
        sync(px)
        t2 = time.perf_counter(); tdec += t2 - t1
        if b < 6:
            rng, k2 = jax.random.split(rng)
            cache = refresh_block(params=qp, cfg=cfg_q, rope=pipe.rope,
                                  ctx_kv=ctx_kv_q, cache=cache, x0=blk,
                                  rng=k2, context_noise=pipe.context_noise,
                                  start_frame=start, static_kv_hi=b*nb*fs)
            sync(cache.local_end)
            t3 = time.perf_counter(); tref += t3 - t2
        start = start + nb
        if report:
            print(f"block {b}: den {t1-t0:.3f}s dec {t2-t1:.3f}s", flush=True)
    if report:
        print(f"TOTAL denoise {tden:.2f}s decode {tdec:.2f}s refresh {tref:.2f}s sum {tden+tdec+tref:.2f}s", flush=True)

run()        # compile
run(True)
run(True)
