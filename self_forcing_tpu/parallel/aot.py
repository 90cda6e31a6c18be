"""AOT topology compilation — real Wan-14B fit evidence without hardware.

The fork's stated goal is distilling a pose-conditioned 1.3B student from
a Wan-14B teacher (reference ``pose_distillation_paths.md``); Wan-14B bf16
is ~28 GB of weights and cannot fit one 16 GB v5e chip.  The sharding
answers are ``parallel/tensor.py`` (Megatron TP for the chunk-wise AR
sampler) and ``parallel/sequence.py`` (ring-attention sp teacher inside
the DMD step) — this module PROVES they fit by compiling the *real
programs at true 14B dims* (5120 dim / 40 layers / 40 heads) against a
deviceless TPU ``DeviceTopology`` (``jax.experimental.topologies``; the
PJRT TPU compiler runs locally — no chips, no tunnel) and reading XLA's
own per-device memory analysis off the compiled executable.  Parameters
and optimizer state are never materialized: everything is
``jax.eval_shape`` + ``ShapeDtypeStruct`` with explicit shardings.

Driven by ``tests/test_aot_14b.py`` (slow lane) and
``scripts/aot_14b_fit.py`` (writes the AOT14B json artifact).
"""
from __future__ import annotations

import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from self_forcing_tpu.models.wan import dit
from self_forcing_tpu.models.wan.configs import WAN_14B, WanConfig
from self_forcing_tpu.models.wan.rope import RopeTables
from self_forcing_tpu.scheduler import FlowMatchScheduler

# USABLE HBM per chip by topology platform prefix (the fit bar).  v5e is
# the XLA-enforced budget its TPU compiler prints ("of 15.75G hbm") — 16
# GiB minus the system carve-out; v5p/v6e keep the same ~1.6% reserve off
# their nominal 95/32 GiB.
HBM_BYTES = {"v5e": int(15.75 * 2 ** 30),
             "v5p": int(93.5 * 2 ** 30),
             "v6e": int(31.5 * 2 ** 30)}


def get_topology(name: str = "v5e:2x2"):
    """Compile-only device topology (e.g. 'v5e:2x2' = 4 chips)."""
    from jax.experimental import topologies
    return topologies.get_topology_desc(name, platform="tpu")


def hbm_limit(topology_name: str) -> int:
    return HBM_BYTES[topology_name.split(":")[0]]


def _structs(mesh: Mesh, tree_shapes, specs):
    """ShapeDtypeStructs with NamedShardings from a (shapes, P-specs) pair."""
    return jax.tree_util.tree_map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        tree_shapes, specs)


def per_device_bytes(struct_tree) -> int:
    """Exact per-device bytes of a ShapeDtypeStruct tree with
    NamedShardings (the per-shard byte accounting)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(struct_tree):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        div = 1
        sh = leaf.sharding
        for entry in (sh.spec or ()):
            if entry is None:
                continue
            for ax in (entry if isinstance(entry, tuple) else (entry,)):
                div *= sh.mesh.shape[ax]
        total += (n // div) * leaf.dtype.itemsize
    return total


def _mem_dict(compiled, label: str) -> dict:
    ma = compiled.memory_analysis()
    return {
        "label": label,
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "alias_bytes": int(ma.alias_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "peak_bytes": int(ma.peak_memory_in_bytes),
        "code_bytes": int(ma.generated_code_size_in_bytes),
    }


def tp_sampler_fit(cfg: WanConfig = WAN_14B, tp: int = 4,
                   topology_name: str = "v5e:2x2",
                   height: int = 480, width: int = 832,
                   num_frame_per_block: int = 3, frames: int = 21,
                   steps: tuple = (1000.0, 750.0, 500.0, 250.0),
                   dtype=jnp.bfloat16, timestep_shift: float = 8.0) -> dict:
    """AOT-compile the TP streaming sampler's hot program — one
    ``denoise_block_tp`` at the FULL-window cache (the worst block) — at
    true ``cfg`` dims over a deviceless ``topology_name``, and return
    XLA's per-device memory analysis plus a fit verdict vs the chip HBM.

    This is the Wan-14B single-host streaming deployment path
    (parallel/tensor.py; the reference names the 14B model in
    pose_distillation_paths.md but has no TP at all — SURVEY §2.8).
    """
    from self_forcing_tpu.ops.attention import set_attention_backend
    from self_forcing_tpu.parallel import tensor as tpmod

    set_attention_backend("pallas")  # the kernels that actually run on TPU
    try:
        topo = get_topology(topology_name)
        devices = np.array(topo.devices)
        assert devices.size >= tp, (devices.size, tp)
        mesh = Mesh(devices[:tp], ("tp",))
        rope = RopeTables.create(cfg.head_dim)
        sched = FlowMatchScheduler.create(1000, shift=timestep_shift,
                                          training=True)
        cfg = dataclasses.replace(cfg,
                                  num_frame_per_block=num_frame_per_block)
        B, C = 1, cfg.in_dim
        H, W = height // 8, width // 8
        fs = (H // cfg.patch_size[1]) * (W // cfg.patch_size[2])
        nb = num_frame_per_block

        p_shapes = jax.eval_shape(
            lambda: dit.init_params(jax.random.PRNGKey(0), cfg, dtype))
        params_s = _structs(mesh, p_shapes, tpmod.tp_param_specs(p_shapes))
        cache_s = _structs(
            mesh,
            jax.eval_shape(lambda: dit.init_kv_cache(cfg, B, fs, frames,
                                                     dtype)),
            tpmod._cache_specs())
        ctx_shapes = jax.eval_shape(
            lambda p, c: dit.precompute_context(p, cfg, c), p_shapes,
            jax.ShapeDtypeStruct((B, 512, cfg.text_dim), dtype))
        ctx_s = _structs(mesh, ctx_shapes, tpmod._ctx_specs(ctx_shapes))
        rep = NamedSharding(mesh, P())
        noise_s = jax.ShapeDtypeStruct((B, nb, C, H, W), dtype,
                                       sharding=rep)
        rng_s = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
        start_s = jax.ShapeDtypeStruct((), jnp.int32, sharding=rep)

        # the cache is donated exactly as in the production block loop
        # (pipelines/causal_inference.py denoise_block donate_argnums) —
        # without it XLA double-counts cache-in + cache-out (13.4 GB of
        # phantom HBM at 14B geometry)
        @functools.partial(jax.jit, donate_argnums=(3,))
        def step(p, sch, ckv, cache, nz, r, s):
            return tpmod.denoise_block_tp(p, cfg, sch, rope, ckv, cache,
                                          nz, r, steps, s, mesh)

        t0 = time.time()
        # pin the matmul precision TPU runs actually use — an ambient
        # 'highest' (tests/conftest.py sets it for CPU numerics) makes
        # Mosaic reject the bf16 kernel dots ('Bad lhs type')
        with jax.default_matmul_precision("default"):
            compiled = step.lower(params_s, sched, ctx_s, cache_s, noise_s,
                                  rng_s, start_s).compile()
        out = _mem_dict(compiled, f"tp{tp}_denoise_block")
        out["compile_s"] = round(time.time() - t0, 1)
        out["params_bytes_per_device"] = per_device_bytes(params_s)
        out["kv_cache_bytes_per_device"] = per_device_bytes(cache_s)
    finally:
        set_attention_backend(None)

    limit = hbm_limit(topology_name)
    out.update(
        topology=topology_name, tp=tp, dim=cfg.dim, layers=cfg.num_layers,
        heads=cfg.num_heads, frames=frames, height=height, width=width,
        hbm_limit_bytes=limit,
        fits=bool(out["peak_bytes"] <= limit),
    )
    return out


# ---------------------------------------------------------------------
# sp-teacher DMD step (the training-side 14B story)
# ---------------------------------------------------------------------

from self_forcing_tpu.parallel.mesh import combined_fsdp_specs  # noqa: E402
# (re-exported here for back-compat; the implementation moved to
# parallel/mesh.py so the ZeRO-3-over-sp teacher layout can share it)


def _opt_state_structs(opt_shapes, param_structs, mesh: Mesh):
    """ShapeDtypeStructs for optimizer state: moment trees (same treedef
    as the params) inherit the param shardings — exactly what GSPMD
    propagates; scalar counters replicated."""
    params_treedef = jax.tree_util.tree_structure(param_structs)
    param_leaves = jax.tree_util.tree_leaves(param_structs)
    rep = NamedSharding(mesh, P())

    def walk(node):
        if jax.tree_util.tree_structure(node) == params_treedef:
            return jax.tree_util.tree_unflatten(params_treedef, [
                jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=p.sharding)
                for l, p in zip(jax.tree_util.tree_leaves(node),
                                param_leaves)])
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[walk(getattr(node, f))
                                for f in node._fields])
        if isinstance(node, tuple):
            return tuple(walk(c) for c in node)
        if isinstance(node, list):
            return [walk(c) for c in node]
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return jax.ShapeDtypeStruct(node.shape, node.dtype, sharding=rep)

    return walk(opt_shapes)


def sp_dmd_fit(student_cfg: WanConfig, teacher_cfg: WanConfig = WAN_14B,
               topology_name: str = "v5e:4x4", fsdp: int = 4, sp: int = 4,
               height: int = 480, width: int = 832, frames: int = 21,
               num_frame_per_block: int = 3,
               steps=(1000, 750, 500, 250), dtype=jnp.bfloat16,
               teacher_zero3: bool = False) -> dict:
    """AOT-compile the DMD *generator* training step — full 1.3B student
    rollout with gradient + 1.3B fake_score + the frozen Wan-14B
    real_score running ring-attention sequence-parallel over 'sp' (the
    reference's xdit USP teacher, xdit_context_parallel.py:66-184) — at
    true dims over a deviceless ``fsdp x sp`` topology.  Returns XLA's
    compiled per-device memory analysis, an exact per-shard byte
    accounting of the persistent train state, and the fit verdict.

    Sharding layout (the 14B deployment story):
    - teacher params: FSDP over 'fsdp' by default (they enter the
      sp-manual shard_map replicated over 'sp').  ``teacher_zero3=True``
      shards them over fsdp x sp = ALL devices and re-gathers one layer
      at a time inside the sp forward (sequence.py param_specs) — the
      layout that fits a 14B teacher on a v5e-8 (fsdp=2 x sp=4), where
      fsdp-only sharding leaves 14 GB/device of teacher alone;
    - student/critic params + Adam moments + EMA: FSDP over the COMBINED
      ('fsdp','sp') axes — all devices — legal because students run in
      GSPMD-auto land end to end;
    - batch replicated (B=1: one rollout is the unit of work,
      model/base.py:193-197 syncs exactly one rollout shape per step).

    Memory model asserted against HBM:
      resident = step peak (XLA; args are the state this step touches,
      temps include the rollout KV cache / remat / grads)
               + critic opt state + EMA (held between alternating steps).
    """
    import optax

    from self_forcing_tpu.ops.attention import set_attention_backend
    from self_forcing_tpu.parallel.mesh import create_mesh, fsdp_shardings
    from self_forcing_tpu.training.objectives import dmd
    from self_forcing_tpu.training.objectives.base import (ModelBundle,
                                                           ObjectiveConfig)
    from self_forcing_tpu.training.optim import make_optimizer

    # GSPMD cannot partition Mosaic kernels, so the sharded *training*
    # path dispatches the XLA attention everywhere outside the teacher's
    # manual shard_map — exactly what a real multi-chip training run (and
    # the CPU-mesh dryrun) executes.  The Pallas kernels are the
    # latency-path story (TP sampler above, single-chip serving).
    set_attention_backend("xla")
    try:
        topo = get_topology(topology_name)
        devices = list(np.array(topo.devices))
        assert len(devices) == fsdp * sp, (len(devices), fsdp, sp)
        mesh = create_mesh(dp=1, fsdp=fsdp, sp=sp, devices=devices)

        B, C = 1, 16
        H, W = height // 8, width // 8
        obj = ObjectiveConfig(
            num_train_timestep=1000, real_guidance_scale=3.0,
            fake_guidance_scale=0.0, timestep_shift=5.0, ts_schedule=True,
            ts_schedule_max=False, min_score_timestep=0,
            num_frame_per_block=num_frame_per_block,
            same_step_across_blocks=True, last_step_only=False,
            num_training_frames=frames, context_noise=0.0,
            denoising_loss_type="flow")
        gen_cfg = dataclasses.replace(
            student_cfg, num_frame_per_block=num_frame_per_block)
        bundle = ModelBundle.create(gen_cfg, student_cfg, teacher_cfg, obj,
                                    [int(s) for s in steps])
        bundle.teacher_sp_mesh = mesh  # ring-attention teacher forwards
        from self_forcing_tpu.parallel.mesh import (
            rollout_cache_constraint)
        bundle.rollout_act_shard = rollout_cache_constraint(mesh)

        # shapes only — never materialize 14B (or 1.3B) on the host
        gen_shapes = jax.eval_shape(
            lambda: dit.init_params(jax.random.PRNGKey(0), gen_cfg, dtype))
        fake_shapes = jax.eval_shape(
            lambda: dit.init_params(jax.random.PRNGKey(1), student_cfg,
                                    dtype, causal=False))
        real_shapes = jax.eval_shape(
            lambda: dit.init_params(jax.random.PRNGKey(2), teacher_cfg,
                                    dtype, causal=False))
        both = ("fsdp", "sp")
        gen_s = _structs(mesh, gen_shapes,
                         combined_fsdp_specs(gen_shapes, mesh, both))
        fake_s = _structs(mesh, fake_shapes,
                          combined_fsdp_specs(fake_shapes, mesh, both))
        if teacher_zero3:
            real_specs = combined_fsdp_specs(real_shapes, mesh, both)
            real_s = _structs(mesh, real_shapes, real_specs)
            bundle.teacher_param_sp_specs = real_specs
        else:
            real_s = jax.tree_util.tree_map(
                lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                                   sharding=sh),
                real_shapes, fsdp_shardings(real_shapes, mesh))

        optimizer = make_optimizer(lr=1e-4, beta1=0.0, beta2=0.999,
                                   weight_decay=0.01, max_grad_norm=10.0)
        opt_s = _opt_state_structs(jax.eval_shape(optimizer.init, gen_s),
                                   gen_s, mesh)
        critic_opt_s = _opt_state_structs(
            jax.eval_shape(optimizer.init, fake_s), fake_s, mesh)

        rep = NamedSharding(mesh, P())
        ctx_s = jax.ShapeDtypeStruct((B, 512, student_cfg.text_dim), dtype,
                                     sharding=rep)
        noise_s = jax.ShapeDtypeStruct((B, frames, C, H, W), dtype,
                                       sharding=rep)
        rng_s = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)

        exit_idx = len(steps) - 1  # latest exit = longest with-grad chain

        # the generator step, verbatim from the trainer's factory
        # (trainer_distillation._make_gen_step with
        # config.donate_step_buffers=True — mandatory at this scale;
        # reference trainer/distillation.py:230-289 fwdbwd_one_step)
        @functools.partial(jax.jit, donate_argnums=(0, 3))
        def step_fn(gen, fake, real, opt_state, noise, context,
                    neg_context, rng):
            def loss_fn(gp):
                return dmd.generator_loss(bundle, obj, gp, fake, real,
                                          noise, context, neg_context,
                                          exit_idx, rng)
            (loss, log), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(gen)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, gen)
            gen = optax.apply_updates(gen, updates)
            return gen, opt_state, loss, gnorm

        t0 = time.time()
        with jax.default_matmul_precision("default"):  # see tp_sampler_fit
            compiled = step_fn.lower(gen_s, fake_s, real_s, opt_s, noise_s,
                                     ctx_s, ctx_s, rng_s).compile()
        out = _mem_dict(compiled, f"fsdp{fsdp}_sp{sp}_dmd_gen_step")
        out["compile_s"] = round(time.time() - t0, 1)

        state = {
            "generator_params": per_device_bytes(gen_s),
            "generator_opt": per_device_bytes(opt_s),
            "fake_score_params": per_device_bytes(fake_s),
            "critic_opt": per_device_bytes(critic_opt_s),
            "real_score_params": per_device_bytes(real_s),
            "generator_ema": per_device_bytes(gen_s),
        }
        out["state_bytes_per_device"] = state
    finally:
        set_attention_backend(None)

    limit = hbm_limit(topology_name)
    nonstep = state["critic_opt"] + state["generator_ema"]
    out.update(
        teacher_zero3=teacher_zero3,
        topology=topology_name, fsdp=fsdp, sp=sp,
        student_dim=student_cfg.dim, teacher_dim=teacher_cfg.dim,
        teacher_layers=teacher_cfg.num_layers, frames=frames,
        hbm_limit_bytes=limit,
        resident_peak_bytes=int(out["peak_bytes"] + nonstep),
        fits=bool(out["peak_bytes"] + nonstep <= limit),
    )
    return out
