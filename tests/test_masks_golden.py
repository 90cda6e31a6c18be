"""Golden tests: IntervalMask families vs the reference's flex mask_mod
functions evaluated densely (causal_model.py:518-723)."""
import math

import numpy as np
import pytest

from self_forcing_tpu.ops.masks import (block_causal_mask,
                                        block_causal_mask_i2v,
                                        teacher_forcing_mask)
from tests.test_causal_golden import _load_ref_causal


def _dense_ref_mask(build_fn, total):
    """Run the reference mask builder with create_block_mask patched to
    return the dense boolean mask."""
    import torch
    mod = _load_ref_causal()
    saved = mod.create_block_mask

    captured = {}

    def capture(mask_mod, B, H, Q_LEN, KV_LEN, _compile=False, device=None):
        q = torch.arange(Q_LEN, dtype=torch.long)[:, None]
        k = torch.arange(KV_LEN, dtype=torch.long)[None, :]
        captured["mask"] = mask_mod(None, None, q, k)
        return captured["mask"]

    mod.create_block_mask = capture
    try:
        build_fn(mod)
    finally:
        mod.create_block_mask = saved
    return captured["mask"].numpy()[:total, :total]


@pytest.mark.parametrize("nfpb,local", [(2, -1), (2, 1), (1, -1)])
def test_block_causal_mask_matches_reference(nfpb, local):
    F, fs = 4, 16
    total = F * fs

    def build(mod):
        mod.CausalWanModel._prepare_blockwise_causal_attn_mask(
            "cpu", num_frames=F, frame_seqlen=fs, num_frame_per_block=nfpb,
            local_attn_size=local)

    ref = _dense_ref_mask(build, total)
    ours = np.asarray(block_causal_mask(F, fs, nfpb, local).materialize())
    # exact, INCLUDING the reference's '| (q_idx == kv_idx)' diagonal
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("nfpb,local", [(2, -1), (2, 1)])
def test_i2v_mask_matches_reference(nfpb, local):
    F, fs = 5, 16  # 1 + 2*2 frames
    total = F * fs

    def build(mod):
        mod.CausalWanModel._prepare_blockwise_causal_attn_mask_i2v(
            "cpu", num_frames=F, frame_seqlen=fs, num_frame_per_block=nfpb,
            local_attn_size=local)

    ref = _dense_ref_mask(build, total)
    ours = np.asarray(block_causal_mask_i2v(F, fs, nfpb, local)
                      .materialize())
    np.testing.assert_array_equal(ours, ref)


def test_teacher_forcing_mask_matches_reference():
    F, fs, nfpb = 4, 16, 2
    total = 2 * F * fs

    def build(mod):
        mod.CausalWanModel._prepare_teacher_forcing_mask(
            "cpu", num_frames=F, frame_seqlen=fs, num_frame_per_block=nfpb)

    ref = _dense_ref_mask(build, total)
    ours = np.asarray(teacher_forcing_mask(F, fs, nfpb).materialize())
    off = ~np.eye(total, dtype=bool)
    np.testing.assert_array_equal(ours & off, ref & off)


def test_block_causal_small_window_keeps_diagonal():
    """local_attn_size smaller than the block: the reference's
    '| (q_idx == kv_idx)' keeps every query self-visible
    (causal_model.py:549-552) — rows outside their own window were fully
    masked before the second-interval diagonal."""
    from self_forcing_tpu.ops.masks import block_causal_mask
    fs, F, nb, local = 4, 8, 4, 2
    m = block_causal_mask(F, fs, num_frame_per_block=nb,
                          local_attn_size=local)
    total = F * fs
    import jax.numpy as jnp
    q = np.arange(total)
    vis_self = np.asarray(m.visible(jnp.asarray(q), jnp.asarray(q)))
    assert vis_self.all()
    # and the window semantics are otherwise unchanged
    ends = (q // (fs * nb) + 1) * (fs * nb)
    lo = np.maximum(ends - local * fs, 0)
    for qi in (0, 5, 17, 31):
        cols = np.arange(total)
        ref = ((cols < min(ends[qi], total)) & (cols >= lo[qi])) | \
            (cols == qi)
        got = np.asarray(m.visible(jnp.full(total, qi), jnp.asarray(cols)))
        np.testing.assert_array_equal(got, ref)
