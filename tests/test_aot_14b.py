"""Wan-14B fit evidence via deviceless AOT topology compilation
(parallel/aot.py; VERDICT r4 next #2).

These compile the REAL sharded programs at TRUE Wan-14B dims
(5120 dim / 40 layers / 40 heads) against a v5e DeviceTopology — the
PJRT TPU compiler runs locally, no chips needed — and assert XLA's own
per-device memory numbers fit the 16 GiB v5e HBM.  The tiny-dims test
exercises the whole machinery in the default lane; the true-dims
compiles are slow-lane (the TP one compiles in ~40 s, the DMD step in
minutes on this 1-core host).

Reference anchors: pose_distillation_paths.md (the 14B goal),
wan/distributed/xdit_context_parallel.py:66-184 (the sp teacher).
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_forcing_tpu.models.wan.configs import WAN_1_3B, WanConfig
from self_forcing_tpu.parallel import aot


def _have_tpu_compiler() -> bool:
    try:
        aot.get_topology("v5e:2x2")
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _have_tpu_compiler(),
    reason="no local PJRT TPU compiler for topology AOT")


def test_aot_machinery_tiny():
    """Default-lane: the topology-AOT path end to end at tiny dims —
    sharded ShapeDtypeStructs, Pallas lowering for the TP sampler, the
    XLA-attention DMD step, per-device byte accounting."""
    student = WanConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=2,
                        text_dim=32, freq_dim=16)
    teacher = WanConfig(dim=256, ffn_dim=512, num_heads=4, num_layers=2,
                        text_dim=32, freq_dim=16)
    r = aot.tp_sampler_fit(teacher, tp=4, topology_name="v5e:2x2",
                           height=64, width=64, frames=4,
                           num_frame_per_block=2, steps=(1000.0, 500.0))
    assert r["fits"] and r["peak_bytes"] > 0, r
    assert r["params_bytes_per_device"] > 0
    assert r["kv_cache_bytes_per_device"] > 0

    r2 = aot.sp_dmd_fit(student, teacher, topology_name="v5e:2x2",
                        fsdp=2, sp=2, height=64, width=64, frames=4,
                        num_frame_per_block=2, steps=(1000, 500))
    assert r2["fits"] and r2["peak_bytes"] > 0, r2
    assert r2["state_bytes_per_device"]["real_score_params"] > 0

    # ZeRO-3-over-sp teacher layout: sharded over fsdp x sp, per-layer
    # gathered inside the forward — must compile and halve the teacher's
    # per-device residency vs the fsdp-only layout
    r3 = aot.sp_dmd_fit(student, teacher, topology_name="v5e:2x2",
                        fsdp=2, sp=2, height=64, width=64, frames=4,
                        num_frame_per_block=2, steps=(1000, 500),
                        teacher_zero3=True)
    assert r3["fits"], r3
    assert r3["state_bytes_per_device"]["real_score_params"] < \
        r2["state_bytes_per_device"]["real_score_params"], (r3, r2)


@pytest.mark.slow
def test_aot_14b_tp_sampler_fits_v5e4():
    """TRUE Wan-14B chunk-wise AR sampler, TP=4 over a v5e-4: XLA's
    compiled per-device peak must fit 16 GiB HBM (measured r5: 13.4 GB =
    7.5 GB params + 6.7 GB KV cache + 0.2 GB temps, donation-aliased)."""
    r = aot.tp_sampler_fit(tp=4, topology_name="v5e:2x2")
    print("\nAOT 14B tp sampler:", json.dumps(r, indent=1))
    assert r["dim"] == 5120 and r["layers"] == 40 and r["heads"] == 40
    assert r["fits"], r
    # the sharding really divides the big state: params ~7.5 GB/device
    # (28.6/4 + replicated leaves), cache exactly 26.84/4 GB
    assert 6.5e9 < r["params_bytes_per_device"] < 8.5e9, r
    assert abs(r["kv_cache_bytes_per_device"] - 40 * 40 * 32760 * 128 * 2
               * 2 / 4) < 2e6, r
    # donation really aliased the cache (no double count)
    assert r["alias_bytes"] >= r["kv_cache_bytes_per_device"] * 0.99, r


@pytest.mark.slow
def test_aot_14b_sp_dmd_fits_v5e16():
    """TRUE 14B-teacher DMD generator step — full 1.3B student rollout +
    ring-attention sp=4 teacher — over a v5e-16 (fsdp=4 x sp=4): compiled
    step peak + between-steps state must fit 16 GiB/device."""
    r = aot.sp_dmd_fit(WAN_1_3B, topology_name="v5e:4x4", fsdp=4, sp=4)
    print("\nAOT 14B sp-dmd:", json.dumps(r, indent=1))
    assert r["teacher_dim"] == 5120 and r["teacher_layers"] == 40
    assert r["fits"], r
    # teacher at fsdp=4: ~28.6/4 GB per device
    tb = r["state_bytes_per_device"]["real_score_params"]
    assert 6.5e9 < tb < 8.0e9, tb
