"""Attention ops: chunked flash vs dense oracle; mask families vs the
reference's flex-attention mask predicates (causal_model.py:518-723)."""
import numpy as np
import jax
import jax.numpy as jnp

from self_forcing_tpu.ops.attention import (dense_attention, decode_attention,
                                            flash_attention)
from self_forcing_tpu.ops.masks import (block_causal_mask,
                                        block_causal_mask_i2v,
                                        teacher_forcing_mask)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def _oracle(q, k, v, mask=None, scale=None):
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    s = jnp.einsum("bqnd,bknd->bnqk", q, k) * scale
    if mask is not None:
        s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnqk,bknd->bqnd", p, v)


def test_flash_matches_dense_unmasked():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(ks[0], (2, 100, 4, 32))
    k = _rand(ks[1], (2, 100, 4, 32))
    v = _rand(ks[2], (2, 100, 4, 32))
    out = flash_attention(q, k, v, None, kv_chunk=32)
    ref = _oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_block_causal():
    F, fs, nb = 6, 16, 2
    S = F * fs
    mask = block_causal_mask(F, fs, nb)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand(ks[0], (1, S, 2, 16))
    k = _rand(ks[1], (1, S, 2, 16))
    v = _rand(ks[2], (1, S, 2, 16))
    out = flash_attention(q, k, v, mask, kv_chunk=24)
    ref = _oracle(q, k, v, mask.materialize())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decode_attention_window():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    S, Lq = 96, 32
    q = _rand(ks[0], (1, Lq, 2, 16))
    kc = _rand(ks[1], (1, S, 2, 16))
    vc = _rand(ks[2], (1, S, 2, 16))
    lo, hi = 16, 64
    out = decode_attention(q, kc, vc, jnp.int32(lo), jnp.int32(hi),
                           kv_chunk=16)
    ref = _oracle(q, kc[:, lo:hi], vc[:, lo:hi])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dense_attention_matches_oracle():
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = _rand(ks[0], (2, 64, 4, 32))
    k = _rand(ks[1], (2, 16, 4, 32))
    v = _rand(ks[2], (2, 16, 4, 32))
    out = dense_attention(q, k, v)
    ref = _oracle(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------- masks

def _ref_block_causal(total, fs, nb, local=-1):
    """Direct transcription of the reference mask predicate
    (causal_model.py:536-552) as a dense boolean matrix."""
    block = fs * nb
    ends = np.zeros(total, np.int64)
    for s in range(0, total, block):
        ends[s:s + block] = s + block
    q = np.arange(total)[:, None]
    j = np.arange(total)[None, :]
    if local == -1:
        return (j < ends[q.ravel()][:, None]) | (q == j)
    return ((j < ends[q.ravel()][:, None])
            & (j >= ends[q.ravel()][:, None] - local * fs)) | (q == j)


def test_block_causal_mask_matches_reference_predicate():
    F, fs, nb = 6, 8, 2
    ours = np.asarray(block_causal_mask(F, fs, nb).materialize())
    ref = _ref_block_causal(F * fs, fs, nb)
    # the reference adds the diagonal for padded rows only; on unpadded
    # geometry every diagonal entry is already visible.
    np.testing.assert_array_equal(ours, ref)


def test_block_causal_local_window():
    F, fs, nb, win = 8, 4, 2, 4
    ours = np.asarray(block_causal_mask(F, fs, nb, win).materialize())
    ref = _ref_block_causal(F * fs, fs, nb, win)
    np.testing.assert_array_equal(ours, ref)


def test_i2v_mask_first_frame_independent():
    F, fs, nb = 7, 4, 3
    m = np.asarray(block_causal_mask_i2v(F, fs, nb).materialize())
    # first frame attends only to itself
    assert m[:fs, :fs].all()
    assert not m[:fs, fs:].any()
    # second block (frames 1-3) attends to frame 0 + itself
    assert m[fs:fs + 3 * fs, :4 * fs].all()
    assert not m[fs:fs + 3 * fs, 4 * fs:].any()


def test_teacher_forcing_mask_structure():
    F, fs, nb = 4, 4, 2
    S = F * fs
    m = np.asarray(teacher_forcing_mask(F, fs, nb).materialize())
    # clean half is block-causal over [0, S)
    ref_clean = _ref_block_causal(S, fs, nb)
    np.testing.assert_array_equal(m[:S, :S], ref_clean)
    assert not m[:S, S:].any()          # clean never sees noisy
    # noisy block 0 sees only itself (no clean context before block 0)
    blk = fs * nb
    assert m[S:S + blk, S:S + blk].all()
    assert not m[S:S + blk, :S].any()
    # noisy block 1 sees clean block 0 + own noisy block
    assert m[S + blk:, :blk].all()
    assert not m[S + blk:, blk:S].any()
    assert m[S + blk:, S + blk:].all()
    assert not m[S + blk:, S:S + blk].any()
