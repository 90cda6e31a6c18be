"""Pallas kernels vs. the XLA reference attention (interpret mode on CPU).

The kernels are the TPU hot path (SURVEY.md §2.9: flash-attn /
flex_attention replacements); these tests pin them to the XLA
implementations that are themselves golden-tested against torch SDPA."""
import numpy as np
import jax
import jax.numpy as jnp

from self_forcing_tpu.ops.attention import (decode_attention_fresh_xla,
                                            decode_attention_xla,
                                            flash_attention_xla)
from self_forcing_tpu.ops.masks import block_causal_mask, teacher_forcing_mask
from self_forcing_tpu.ops.pallas_attention import (
    decode_attention_fresh_pallas, decode_attention_pallas,
    flash_attention_pallas)

B, N, D = 1, 2, 128


def _qkv(key, Lq, Lk):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Lq, N, D), jnp.float32)
    k = jax.random.normal(kk, (B, Lk, N, D), jnp.float32)
    v = jax.random.normal(kv, (B, Lk, N, D), jnp.float32)
    return q, k, v


def test_decode_matches_xla():
    q, k, v = _qkv(jax.random.PRNGKey(0), 96, 320)
    for lo, hi in [(0, 96), (0, 320), (64, 256)]:
        ref = decode_attention_xla(q, k, v, jnp.int32(lo), jnp.int32(hi))
        out = decode_attention_pallas(q, k, v, jnp.int32(lo), jnp.int32(hi),
                                      tq=128, tk=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_decode_window_excludes_rest():
    """Tokens outside [lo, hi) must not influence the output."""
    q, k, v = _qkv(jax.random.PRNGKey(1), 32, 256)
    lo, hi = 32, 128
    out1 = decode_attention_pallas(q, k, v, jnp.int32(lo), jnp.int32(hi),
                                   tq=128, tk=128, interpret=True)
    k2 = k.at[:, hi:].set(99.0).at[:, :lo].set(-99.0)
    v2 = v.at[:, hi:].set(99.0).at[:, :lo].set(-99.0)
    out2 = decode_attention_pallas(q, k2, v2, jnp.int32(lo), jnp.int32(hi),
                                   tq=128, tk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


def test_flash_block_causal_matches_xla():
    F, fs = 4, 64  # 256 tokens
    mask = block_causal_mask(F, fs, num_frame_per_block=2)
    q, k, v = _qkv(jax.random.PRNGKey(2), F * fs, F * fs)
    ref = flash_attention_xla(q, k, v, mask)
    out = flash_attention_pallas(q, k, v, mask, tq=128, tk=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_teacher_forcing_matches_xla():
    F, fs = 2, 64  # doubled 256 tokens
    mask = teacher_forcing_mask(F, fs, num_frame_per_block=1)
    L = 2 * F * fs
    q, k, v = _qkv(jax.random.PRNGKey(3), L, L)
    ref = flash_attention_xla(q, k, v, mask)
    out = flash_attention_pallas(q, k, v, mask, tq=128, tk=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_no_mask_matches_xla():
    q, k, v = _qkv(jax.random.PRNGKey(4), 128, 192)
    ref = flash_attention_xla(q, k, v, None)
    out = flash_attention_pallas(q, k, v, None, tq=128, tk=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_grad_matches_xla():
    """custom_vjp routes the backward through the XLA implementation."""
    F, fs = 2, 64
    mask = block_causal_mask(F, fs, 1)
    q, k, v = _qkv(jax.random.PRNGKey(5), F * fs, F * fs)

    def loss_p(q, k, v):
        return jnp.sum(flash_attention_pallas(q, k, v, mask, tq=128,
                                              tk=128, interpret=True) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(flash_attention_xla(q, k, v, mask) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_grad_odd_length_padding():
    """Backward at a length no tile divides: exercises the q/k padding and
    the fwd->bwd lse re-tiling (fwd and bwd tile grids differ), plus the
    two-interval teacher-forcing mask in the gradient."""
    F, fs = 5, 40                                 # L = 200
    mask = teacher_forcing_mask(F, fs, num_frame_per_block=1)
    q, k, v = _qkv(jax.random.PRNGKey(11), F * fs, F * fs)

    def loss_p(q, k, v):
        return jnp.sum(flash_attention_pallas(q, k, v, mask, tq=128,
                                              tk=128, interpret=True) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(flash_attention_xla(q, k, v, mask) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_decode_fresh_matches_xla():
    from self_forcing_tpu.ops.attention import decode_attention_fresh_xla
    from self_forcing_tpu.ops.pallas_attention import (
        decode_attention_fresh_pallas)
    q, k, v = _qkv(jax.random.PRNGKey(7), 96, 320)
    kn = jax.random.normal(jax.random.PRNGKey(8), (B, 96, N, D))
    vn = jax.random.normal(jax.random.PRNGKey(9), (B, 96, N, D))
    for lo, hi in [(0, 0), (0, 192), (64, 320)]:
        ref = decode_attention_fresh_xla(q, k, v, kn, vn, jnp.int32(lo),
                                         jnp.int32(hi))
        out = decode_attention_fresh_pallas(q, k, v, kn, vn, jnp.int32(lo),
                                            jnp.int32(hi), tq=128, tk=128,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_decode_fresh_grad_matches_xla():
    from self_forcing_tpu.ops.attention import decode_attention_fresh_xla
    from self_forcing_tpu.ops.pallas_attention import (
        decode_attention_fresh_pallas)
    q, k, v = _qkv(jax.random.PRNGKey(10), 64, 128)
    kn = jax.random.normal(jax.random.PRNGKey(11), (B, 64, N, D))
    vn = jax.random.normal(jax.random.PRNGKey(12), (B, 64, N, D))
    lo, hi = jnp.int32(0), jnp.int32(128)

    gp = jax.grad(lambda q_, kn_, vn_: jnp.sum(decode_attention_fresh_pallas(
        q_, k, v, kn_, vn_, lo, hi, tq=128, tk=128, interpret=True) ** 2),
        argnums=(0, 1, 2))(q, kn, vn)
    gx = jax.grad(lambda q_, kn_, vn_: jnp.sum(decode_attention_fresh_xla(
        q_, k, v, kn_, vn_, lo, hi) ** 2), argnums=(0, 1, 2))(q, kn, vn)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_conv3d_matches_lax():
    """Strip-matmul causal conv kernel (ops/pallas_conv.py) vs lax conv."""
    from self_forcing_tpu.ops.pallas_conv import causal_conv3d_pallas
    key = jax.random.PRNGKey(20)
    Bc, T, H, W, C, Co = 1, 2, 8, 16, 16, 16
    x = jax.random.normal(key, (Bc, T, H, W, C), jnp.float32)
    cache = jax.random.normal(jax.random.fold_in(key, 1),
                              (Bc, 2, H, W, C), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 2),
                          (3, 3, 3, C, Co), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 3), (Co,), jnp.float32)
    xin = jnp.concatenate([cache, x], axis=1)
    ref = jax.lax.conv_general_dilated(
        xin, w, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    out = causal_conv3d_pallas(x, cache, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_w8a8_matmul_matches_xla():
    """Fused-epilogue W8A8 Pallas matmul == the XLA int8 dot + dequant."""
    from self_forcing_tpu.ops.pallas_matmul import w8a8_matmul
    key = jax.random.PRNGKey(7)
    M, K, N_ = 40, 256, 384
    x_q = jax.random.randint(key, (M, K), -127, 128).astype(jnp.int8)
    w_q = jax.random.randint(jax.random.fold_in(key, 1), (K, N_),
                             -127, 128).astype(jnp.int8)
    s_x = jax.random.uniform(jax.random.fold_in(key, 2), (M, 1),
                             minval=0.01, maxval=0.1)
    w_s = jax.random.uniform(jax.random.fold_in(key, 3), (N_,),
                             minval=0.01, maxval=0.1)
    b = jax.random.normal(jax.random.fold_in(key, 4), (N_,))
    ref = (jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
        * (s_x * w_s) + b)
    out = w8a8_matmul(x_q, s_x, w_q, w_s, b, out_dtype=jnp.float32,
                      interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_w8a8_ffn_fused_matches_float():
    """Fused fc1+gelu+group-quant+fc2 kernel pair stays within int8
    quantization noise of the float FFN, and matches an exact XLA
    emulation of its own group-wise semantics."""
    from self_forcing_tpu.ops.pallas_matmul import w8a8_ffn
    from self_forcing_tpu.ops.quant import (quantize_activations,
                                            quantize_linear_params)
    key = jax.random.PRNGKey(11)
    M, K, H = 64, 256, 896
    x = jax.random.normal(key, (M, K), jnp.float32) * 0.5
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (K, H)) * 0.05
    w2 = jax.random.normal(jax.random.fold_in(key, 2), (H, K)) * 0.05
    b1 = jax.random.normal(jax.random.fold_in(key, 3), (H,)) * 0.1
    b2 = jax.random.normal(jax.random.fold_in(key, 4), (K,)) * 0.1
    p1 = quantize_linear_params({"w": w1, "b": b1})
    p2 = quantize_linear_params({"w": w2, "b": b2})
    x_q, s_x = quantize_activations(x)
    out = w8a8_ffn(x_q, s_x, p1["w_qa"], p1["w_scale"], p1["b"],
                   p2["w_qa"], p2["w_scale"], p2["b"],
                   out_dtype=jnp.float32, interpret=True)
    assert out is not None

    ref_f = jax.nn.gelu(x @ w1 + b1, approximate=True) @ w2 + b2
    scale = float(jnp.max(jnp.abs(ref_f)))
    assert float(jnp.max(jnp.abs(out - ref_f))) / scale < 0.05

    # exact group-wise emulation (group width = 896 at this geometry)
    h = (jax.lax.dot_general(x_q, p1["w_qa"], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32
                             ).astype(jnp.float32) * (s_x * p1["w_scale"])
         + b1)
    g = jax.nn.gelu(h, approximate=True)
    tg = 896
    gg = g.reshape(M, H // tg, tg)
    s_g = jnp.maximum(jnp.max(jnp.abs(gg), axis=-1, keepdims=True),
                      1e-6) / 127.0
    g_q = jnp.clip(jnp.round(gg / s_g), -127, 127).astype(jnp.int8)
    acc = jnp.zeros((M, K), jnp.float32)
    for j in range(H // tg):
        pj = jax.lax.dot_general(
            g_q[:, j], p2["w_qa"][j * tg:(j + 1) * tg],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + pj.astype(jnp.float32) * s_g[:, j]
    ref_g = acc * p2["w_scale"] + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_g),
                               rtol=1e-4, atol=1e-4)


def test_decode_fresh_static_hi_matches_xla():
    """Static grid bound (pipeline block hints) must not change results."""
    q, k, v = _qkv(jax.random.PRNGKey(3), 96, 320)
    kn, vn = _qkv(jax.random.PRNGKey(4), 96, 96)[1:]
    for lo, hi, static_hi in [(0, 0, 0), (0, 128, 128), (0, 128, 192),
                              (0, 320, 320), (0, 100, 128), (37, 290, 320)]:
        ref = decode_attention_fresh_xla(q, k, v, kn, vn,
                                         jnp.int32(lo), jnp.int32(hi))
        out = decode_attention_fresh_pallas(
            q, k, v, kn, vn, jnp.int32(lo), jnp.int32(hi),
            tq=32, tk=64, interpret=True, static_hi=static_hi)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_decode_fresh_int8_close_to_xla():
    """quant='int8' (demo speed toggle): int8-MXU QK/PV with per-tile K/V
    scales stays within quantization tolerance of the exact reference."""
    key = jax.random.PRNGKey(11)
    q, kc, vc = _qkv(key, 96, 256)
    kn = jax.random.normal(jax.random.fold_in(key, 1), (B, 96, N, D))
    vn = jax.random.normal(jax.random.fold_in(key, 2), (B, 96, N, D))
    lo, hi = jnp.int32(32), jnp.int32(200)
    ref = decode_attention_fresh_xla(q, kc, vc, kn, vn, lo, hi)
    out = decode_attention_fresh_pallas(q, kc, vc, kn, vn, lo, hi,
                                        tq=32, tk=64, interpret=True,
                                        quant="int8")
    d = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert d.max() < 0.05 * max(scale, 1.0), (d.max(), scale)
    assert d.mean() < 0.01, d.mean()


def test_decode_fresh_int8_window_respected():
    """int8 path applies the same [lo, hi) cache-window masking."""
    key = jax.random.PRNGKey(12)
    q, kc, vc = _qkv(key, 64, 256)
    kn = jax.random.normal(jax.random.fold_in(key, 1), (B, 64, N, D))
    vn = jax.random.normal(jax.random.fold_in(key, 2), (B, 64, N, D))
    lo, hi = jnp.int32(64), jnp.int32(128)
    # poison cache outside the window: must not affect the output
    kc2 = kc.at[:, :64].set(100.0).at[:, 128:].set(-100.0)
    vc2 = vc.at[:, :64].set(100.0).at[:, 128:].set(-100.0)
    a = decode_attention_fresh_pallas(q, kc, vc, kn, vn, lo, hi,
                                      tq=32, tk=64, interpret=True,
                                      quant="int8")
    b = decode_attention_fresh_pallas(q, kc2, vc2, kn, vn, lo, hi,
                                      tq=32, tk=64, interpret=True,
                                      quant="int8")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_decode_fresh_stacked_cache_layer_idx():
    """Stacked-cache path: the kernel picks the layer via the prefetched
    scalar; output matches slicing the layer by hand."""
    key = jax.random.PRNGKey(13)
    L, BN, S, Dh = 3, B * N, 256, D
    q, _, _ = _qkv(key, 96, 8)
    kc = jax.random.normal(jax.random.fold_in(key, 1), (L, BN, S, Dh))
    vc = jax.random.normal(jax.random.fold_in(key, 2), (L, BN, S, Dh))
    kn = jax.random.normal(jax.random.fold_in(key, 3), (B, 96, N, Dh))
    vn = jax.random.normal(jax.random.fold_in(key, 4), (B, 96, N, Dh))
    lo, hi = jnp.int32(0), jnp.int32(192)
    for li in range(L):
        ref = decode_attention_fresh_pallas(
            q, kc[li], vc[li], kn, vn, lo, hi, tq=32, tk=64, interpret=True)
        out = decode_attention_fresh_pallas(
            q, kc, vc, kn, vn, lo, hi, tq=32, tk=64, interpret=True,
            layer_idx=jnp.int32(li))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_cross_attention_matches_dense():
    """Single-pass cross-attention kernel vs the XLA dense reference,
    including non-128-multiple KV lengths (257 CLIP image tokens)."""
    from self_forcing_tpu.ops.attention import dense_attention
    from self_forcing_tpu.ops.pallas_attention import cross_attention_pallas
    key = jax.random.PRNGKey(21)
    for Lk in (257, 512):
        q, _, _ = _qkv(key, 96, 8)
        k = jax.random.normal(jax.random.fold_in(key, Lk), (B, Lk, N, D))
        v = jax.random.normal(jax.random.fold_in(key, Lk + 1), (B, Lk, N, D))
        ref = dense_attention(q, k, v)
        out = cross_attention_pallas(q, k, v, tq=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_cross_attention_grad_matches_dense():
    from self_forcing_tpu.ops.attention import dense_attention
    from self_forcing_tpu.ops.pallas_attention import cross_attention_pallas
    key = jax.random.PRNGKey(22)
    q, _, _ = _qkv(key, 64, 8)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, 96, N, D))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, 96, N, D))
    g1 = jax.grad(lambda q_, k_, v_: jnp.sum(
        cross_attention_pallas(q_, k_, v_, tq=32, interpret=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q_, k_, v_: jnp.sum(
        dense_attention(q_, k_, v_) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_decode_fresh_bounded_matches_xla():
    """Bounded-softmax mode (fixed_m0 = score upper bound in place of the
    online running max) is mathematically exact softmax; a loose bound
    only shifts the exp offset.  Mirrors models/wan/dit.py's
    Cauchy-Schwarz bound over q / K row norms."""
    q, k, v = _qkv(jax.random.PRNGKey(20), 96, 320)
    kn = jax.random.normal(jax.random.PRNGKey(21), (B, 96, N, D))
    vn = jax.random.normal(jax.random.PRNGKey(22), (B, 96, N, D))
    scale = D ** -0.5

    def bound(hi):
        qn = jnp.max(jnp.linalg.norm(q, axis=-1))
        kcat = jnp.concatenate([k[:, :hi], kn], axis=1)
        return scale * qn * jnp.max(jnp.linalg.norm(kcat, axis=-1))

    for lo, hi in [(0, 0), (0, 192), (64, 320)]:
        ref = decode_attention_fresh_xla(q, k, v, kn, vn, jnp.int32(lo),
                                         jnp.int32(hi))
        for slack in (0.0, 5.0):
            out = decode_attention_fresh_pallas(
                q, k, v, kn, vn, jnp.int32(lo), jnp.int32(hi), tq=128,
                tk=128, interpret=True, fixed_m0=bound(hi) + slack)
            # bounded mode rounds p to bf16 for the MXU (on-chip the
            # online kernel's MXU ops are demoted the same way; interpret
            # mode keeps the online path in f32) -> bf16-level tolerance
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=5e-3, atol=5e-3)


def test_decode_fresh_int8_bounded_tight_bound():
    """quant='int8' + fixed_m0 with the GLOBAL-m0 variant (opt-in via
    int8_bound='global'; kept for kernel A/Bs).  Only valid with a
    TIGHT bound: p quantizes to int8 against m0, so scores more than
    ln(254) ~ 5.5 nats below the bound truncate to zero.  With slack
    inside that budget the output stays at int8-quantization
    tolerance."""
    key = jax.random.PRNGKey(30)
    q, kc, vc = _qkv(key, 96, 256)
    kn = jax.random.normal(jax.random.fold_in(key, 1), (B, 96, N, D))
    vn = jax.random.normal(jax.random.fold_in(key, 2), (B, 96, N, D))
    lo, hi = jnp.int32(32), jnp.int32(200)
    ref = decode_attention_fresh_xla(q, kc, vc, kn, vn, lo, hi)
    scale = D ** -0.5
    # true max score over the live window + modest slack = tight bound
    sc = jnp.einsum("blnd,bsnd->bnls", q, jnp.concatenate(
        [kc[:, 32:200], kn], axis=1)) * scale
    m0 = float(jnp.max(sc)) + 0.5
    out = decode_attention_fresh_pallas(q, kc, vc, kn, vn, lo, hi,
                                        tq=32, tk=64, interpret=True,
                                        quant="int8", fixed_m0=m0,
                                        int8_bound="global")
    d = np.abs(np.asarray(out) - np.asarray(ref))
    s = np.abs(np.asarray(ref)).max()
    # each nat of slack multiplies the effective p-quantization step by e
    assert d.max() < 0.10 * max(s, 1.0), (d.max(), s)
    assert d.mean() < 0.02, d.mean()


def test_decode_fresh_int8_tile_bounded_loose_bound():
    """quant='int8' + fixed_m0 default = the SAFE tile-bounded variant:
    p quantizes against the exact per-row within-tile max and the tile's
    contribution is weighted by exp(m_tile - m0), so accuracy is
    int8-noise for ANY bound slack — including the >> ln(254) nats where
    the global-m0 variant collapses to zero output.  This is the variant
    dit.py ships when attn_softmax='bounded' + attn_quant='int8'."""
    key = jax.random.PRNGKey(31)
    q, kc, vc = _qkv(key, 96, 256)
    kn = jax.random.normal(jax.random.fold_in(key, 1), (B, 96, N, D))
    vn = jax.random.normal(jax.random.fold_in(key, 2), (B, 96, N, D))
    lo, hi = jnp.int32(32), jnp.int32(200)
    ref = decode_attention_fresh_xla(q, kc, vc, kn, vn, lo, hi)
    scale = D ** -0.5
    sc = jnp.einsum("blnd,bsnd->bnls", q, jnp.concatenate(
        [kc[:, 32:200], kn], axis=1)) * scale
    for slack in (0.5, 11.0, 40.0):
        m0 = float(jnp.max(sc)) + slack
        out = decode_attention_fresh_pallas(q, kc, vc, kn, vn, lo, hi,
                                            tq=32, tk=64, interpret=True,
                                            quant="int8", fixed_m0=m0)
        d = np.abs(np.asarray(out) - np.asarray(ref))
        s = np.abs(np.asarray(ref)).max()
        assert d.max() < 0.05 * max(s, 1.0), (slack, d.max(), s)
        assert d.mean() < 0.01, (slack, d.mean())
    # empty-cache window + loose bound (the TTFC block-0 shape)
    ref0 = decode_attention_fresh_xla(q, kc, vc, kn, vn, jnp.int32(0),
                                      jnp.int32(0))
    out0 = decode_attention_fresh_pallas(
        q, kc, vc, kn, vn, jnp.int32(0), jnp.int32(0), tq=32, tk=64,
        interpret=True, quant="int8", fixed_m0=float(jnp.max(sc)) + 20.0)
    d0 = np.abs(np.asarray(out0) - np.asarray(ref0))
    assert d0.max() < 0.05 * max(np.abs(np.asarray(ref0)).max(), 1.0)


def test_decode_fresh_bounded_packed_layout():
    """Bounded mode with column-packed operands ([B, L, N*D] layout) and a
    stacked cache, as the DiT denoise hot path drives it."""
    key = jax.random.PRNGKey(23)
    L, S = 2, 256
    q, _, _ = _qkv(key, 96, 8)
    kc = jax.random.normal(jax.random.fold_in(key, 1), (L, B * N, S, D))
    vc = jax.random.normal(jax.random.fold_in(key, 2), (L, B * N, S, D))
    kn = jax.random.normal(jax.random.fold_in(key, 3), (B, 96, N, D))
    vn = jax.random.normal(jax.random.fold_in(key, 4), (B, 96, N, D))
    lo, hi = jnp.int32(0), jnp.int32(192)
    scale = D ** -0.5
    qp = q.reshape(B, 96, N * D)
    knp = kn.reshape(B, 96, N * D)
    vnp = vn.reshape(B, 96, N * D)
    for li in range(L):
        m0 = scale * jnp.max(jnp.linalg.norm(q, axis=-1)) * jnp.maximum(
            jnp.max(jnp.linalg.norm(kc[li, :, :192], axis=-1)),
            jnp.max(jnp.linalg.norm(kn, axis=-1)))
        ref = decode_attention_fresh_pallas(
            q, kc[li], vc[li], kn, vn, lo, hi, tq=32, tk=64, interpret=True)
        out = decode_attention_fresh_pallas(
            qp, kc, vc, knp, vnp, lo, hi, tq=32, tk=64, interpret=True,
            layer_idx=jnp.int32(li), heads_packed=N, fixed_m0=m0)
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, 96, N, D), np.asarray(ref),
            rtol=5e-3, atol=5e-3)


def test_flash_bounded_matches_xla():
    """Bounded-offset softmax in the training kernel: exact under bound
    slack (bf16-p tolerance); gradients ride the same lse-recompute
    backward so they match too."""
    F, fs = 4, 64
    mask = block_causal_mask(F, fs, num_frame_per_block=2)
    q, k, v = _qkv(jax.random.PRNGKey(30), F * fs, F * fs)
    scale = D ** -0.5
    m0 = scale * jnp.max(jnp.linalg.norm(q, axis=-1)) * jnp.max(
        jnp.linalg.norm(k, axis=-1))
    ref = flash_attention_xla(q, k, v, mask)
    for slack in (0.0, 5.0):
        out = flash_attention_pallas(q, k, v, mask, tq=128, tk=128,
                                     interpret=True, fixed_m0=m0 + slack)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)

    gp = jax.grad(lambda q_, k_, v_: jnp.sum(flash_attention_pallas(
        q_, k_, v_, mask, tq=128, tk=128, interpret=True,
        fixed_m0=m0) ** 2), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q_, k_, v_: jnp.sum(flash_attention_xla(
        q_, k_, v_, mask) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


def test_decode_fresh_free_softmax_matches_xla():
    """Offset-free base-2 softmax ('free'): exact vs the XLA base-e
    reference when scale*log2(e) is pre-folded into q (pallas runs at
    scale=1.0; the XLA comparator recovers base-e at ln(2))."""
    import math
    LOG2E = 1.4426950408889634
    scale = D ** -0.5
    q, kc, vc = _qkv(jax.random.PRNGKey(40), 96, 320)
    _, kn, vn = _qkv(jax.random.PRNGKey(41), 96, 96)
    lo, hi = jnp.int32(0), jnp.int32(256)
    qp = q * (scale * LOG2E)
    ref = decode_attention_fresh_xla(qp, kc, vc, kn, vn, lo, hi,
                                     scale=math.log(2.0))
    for sm in ("free", "free_noclamp"):
        out = decode_attention_fresh_pallas(qp, kc, vc, kn, vn, lo, hi,
                                            scale=1.0, softmax=sm,
                                            tq=32, tk=64, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)


def test_decode_fresh_free_softmax_grad():
    """The free mode's custom backward re-runs the XLA reference at
    scale*ln(2) — gradients must match the base-e comparator."""
    import math
    LOG2E = 1.4426950408889634
    scale = D ** -0.5
    q, kc, vc = _qkv(jax.random.PRNGKey(42), 64, 128)
    _, kn, vn = _qkv(jax.random.PRNGKey(43), 64, 64)
    lo, hi = jnp.int32(0), jnp.int32(128)
    qp = q * (scale * LOG2E)

    gp = jax.grad(lambda a, b, c: jnp.sum(decode_attention_fresh_pallas(
        a, b, c, kn, vn, lo, hi, scale=1.0, softmax="free",
        tq=32, tk=64, interpret=True) ** 2), argnums=(0, 1, 2))(qp, kc, vc)
    gx = jax.grad(lambda a, b, c: jnp.sum(decode_attention_fresh_xla(
        a, b, c, kn, vn, lo, hi, scale=math.log(2.0)) ** 2),
        argnums=(0, 1, 2))(qp, kc, vc)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


def test_decode_fresh_free_clamp_overflow_proof():
    """Scores past the 80 log2-unit clamp: 'free' must stay finite for
    arbitrary data (no inf/NaN), and a single dominant clamped score
    still resolves to the right (one-hot) attention output."""
    q, kc, vc = _qkv(jax.random.PRNGKey(44), 32, 128)
    _, kn, vn = _qkv(jax.random.PRNGKey(45), 32, 32)
    lo, hi = jnp.int32(0), jnp.int32(128)
    # align q row 0 with cache key 7 at a huge magnitude: score >> 80,
    # while every distractor key is tiny (so the argmax stays key 7 by a
    # wide margin even after clamping)
    kc, kn = kc * 0.01, kn * 0.01
    kc = kc.at[:, 7].set(kc[:, 7] / jnp.linalg.norm(kc[:, 7], axis=-1,
                                                    keepdims=True))
    q = q.at[:, 0].set(200.0 * kc[:, 7])
    out = decode_attention_fresh_pallas(q, kc, vc, kn, vn, lo, hi,
                                        scale=1.0, softmax="free",
                                        tq=32, tk=64, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))
    # row 0 must be ~one-hot on v[7] (clamp keeps the argmax dominant:
    # every other score is O(10) << 80)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(vc[:, 7]),
                               rtol=1e-2, atol=1e-2)


def test_decode_fresh_free_dispatcher_xla_fallback():
    """ops.attention.decode_attention_fresh(softmax='free') off-TPU:
    the XLA fallback must recover exact base-e softmax via scale*ln(2)."""
    from self_forcing_tpu.ops.attention import decode_attention_fresh
    LOG2E = 1.4426950408889634
    scale = D ** -0.5
    q, kc, vc = _qkv(jax.random.PRNGKey(46), 64, 128)
    _, kn, vn = _qkv(jax.random.PRNGKey(47), 64, 64)
    lo, hi = jnp.int32(0), jnp.int32(96)
    qp = q * (scale * LOG2E)
    out = decode_attention_fresh(qp, kc, vc, kn, vn, lo, hi, scale=1.0,
                                 softmax="free")
    ref = decode_attention_fresh_xla(q, kc, vc, kn, vn, lo, hi, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_free_softmax_matches_xla():
    """Offset-free base-2 softmax in the training kernel: forward and
    gradients exact vs the XLA base-e reference at scale=ln(2) (the
    backward recomputes p from the base-e lse the forward emits)."""
    import math
    LOG2E = 1.4426950408889634
    scale = D ** -0.5
    F, fs = 4, 64
    mask = block_causal_mask(F, fs, num_frame_per_block=2)
    q, k, v = _qkv(jax.random.PRNGKey(50), F * fs, F * fs)
    qp = q * (scale * LOG2E)
    ref = flash_attention_xla(qp, k, v, mask, scale=math.log(2.0))
    out = flash_attention_pallas(qp, k, v, mask, tq=128, tk=128,
                                 interpret=True, softmax="free")
    # the kernel's PV contraction runs p in bf16 (MXU operand) vs the
    # XLA reference's f32 — bf16-level tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)

    gp = jax.grad(lambda a, b, c: jnp.sum(flash_attention_pallas(
        a, b, c, mask, tq=128, tk=128, interpret=True,
        softmax="free") ** 2), argnums=(0, 1, 2))(qp, k, v)
    gx = jax.grad(lambda a, b, c: jnp.sum(flash_attention_xla(
        a, b, c, mask, scale=math.log(2.0)) ** 2),
        argnums=(0, 1, 2))(qp, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


def test_decode_fresh_free_int8qk_close_to_xla():
    """int8-QK / bf16-PV on the free softmax path (attn_quant='int8qk'):
    int8-quantization-level accuracy, no p-quantization (and therefore no
    bound) involved."""
    import math
    LOG2E = 1.4426950408889634
    scale = D ** -0.5
    q, kc, vc = _qkv(jax.random.PRNGKey(60), 96, 320)
    _, kn, vn = _qkv(jax.random.PRNGKey(61), 96, 96)
    lo, hi = jnp.int32(0), jnp.int32(256)
    qp = q * (scale * LOG2E)
    ref = decode_attention_fresh_xla(qp, kc, vc, kn, vn, lo, hi,
                                     scale=math.log(2.0))
    out = decode_attention_fresh_pallas(qp, kc, vc, kn, vn, lo, hi,
                                        scale=1.0, softmax="free",
                                        quant="int8qk", tq=32, tk=64,
                                        interpret=True)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d.mean() < 0.02, d.mean()
    assert d.max() < 0.12 * np.abs(np.asarray(ref)).max()


def test_decode_fresh_sink_window_matches_xla():
    """Two-interval [0, sink_end) + [lo, hi) cache window (the round-4
    windowed-streaming view; causal_model.py:203-229 sink semantics
    without the physical roll) vs the XLA reference, across softmax
    modes."""
    q, kc, vc = _qkv(jax.random.PRNGKey(70), 96, 320)
    kn = jax.random.normal(jax.random.PRNGKey(71), (B, 96, N, D))
    vn = jax.random.normal(jax.random.PRNGKey(72), (B, 96, N, D))
    for sk, lo, hi in [(64, 128, 320), (32, 96, 256), (0, 64, 256),
                       (64, 64, 256)]:
        ref = decode_attention_fresh_xla(q, kc, vc, kn, vn, jnp.int32(lo),
                                         jnp.int32(hi),
                                         sink_end=jnp.int32(sk))
        out = decode_attention_fresh_pallas(
            q, kc, vc, kn, vn, jnp.int32(lo), jnp.int32(hi), tq=128,
            tk=64, interpret=True, sink_end=jnp.int32(sk))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=str((sk, lo, hi)))


def test_decode_fresh_sink_window_free_and_int8qk():
    """Sink window on the production free-softmax and int8qk paths."""
    import math
    LOG2E = 1.4426950408889634
    scale = D ** -0.5
    q, kc, vc = _qkv(jax.random.PRNGKey(73), 96, 320)
    _, kn, vn = _qkv(jax.random.PRNGKey(74), 96, 96)
    sk, lo, hi = jnp.int32(64), jnp.int32(160), jnp.int32(320)
    qp = q * (scale * LOG2E)
    ref = decode_attention_fresh_xla(qp, kc, vc, kn, vn, lo, hi,
                                     scale=math.log(2.0), sink_end=sk)
    out = decode_attention_fresh_pallas(qp, kc, vc, kn, vn, lo, hi,
                                        scale=1.0, softmax="free",
                                        tq=32, tk=64, interpret=True,
                                        sink_end=sk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)
    out8 = decode_attention_fresh_pallas(qp, kc, vc, kn, vn, lo, hi,
                                         scale=1.0, softmax="free",
                                         quant="int8qk", tq=32, tk=64,
                                         interpret=True, sink_end=sk)
    d = np.abs(np.asarray(out8) - np.asarray(ref))
    assert d.mean() < 0.02, d.mean()


def test_decode_fresh_sink_window_excludes_gap():
    """Tokens in the dead gap [sink_end, lo) must not influence the
    output: poisoning the gap region leaves the result unchanged."""
    q, kc, vc = _qkv(jax.random.PRNGKey(75), 64, 256)
    kn = jax.random.normal(jax.random.PRNGKey(76), (B, 64, N, D))
    vn = jax.random.normal(jax.random.PRNGKey(77), (B, 64, N, D))
    sk, lo, hi = jnp.int32(32), jnp.int32(128), jnp.int32(256)
    base = decode_attention_fresh_pallas(q, kc, vc, kn, vn, lo, hi,
                                         tq=64, tk=64, interpret=True,
                                         sink_end=sk)
    kc2 = kc.at[:, 32:128].set(1e4)
    vc2 = vc.at[:, 32:128].set(-1e4)
    poisoned = decode_attention_fresh_pallas(q, kc2, vc2, kn, vn, lo, hi,
                                             tq=64, tk=64, interpret=True,
                                             sink_end=sk)
    np.testing.assert_allclose(np.asarray(poisoned), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


def test_decode_fresh_compressed_window_grid():
    """window_static compressed grid (grid covers only sink + recent
    tiles with a prefetched-lo translation) must match both the full
    grid and the XLA reference, across alignments and fill levels."""
    q, kc, vc = _qkv(jax.random.PRNGKey(80), 96, 640)
    kn = jax.random.normal(jax.random.PRNGKey(81), (B, 96, N, D))
    vn = jax.random.normal(jax.random.PRNGKey(82), (B, 96, N, D))
    # (sink_hi, lo, hi) at various fills of a 640-token buffer with a
    # 64-token sink and 256-token recent window
    for sk, lo, hi in [(64, 320, 576), (64, 64, 320), (64, 128, 384),
                       (32, 96, 352), (64, 64, 128), (0, 0, 0)]:
        ref = decode_attention_fresh_xla(q, kc, vc, kn, vn, jnp.int32(lo),
                                         jnp.int32(hi),
                                         sink_end=jnp.int32(sk))
        out = decode_attention_fresh_pallas(
            q, kc, vc, kn, vn, jnp.int32(lo), jnp.int32(hi), tq=128,
            tk=64, interpret=True, sink_end=jnp.int32(sk),
            window_static=(64, 256))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=str((sk, lo, hi)))
    # int8qk path through the compressed grid
    import math
    LOG2E = 1.4426950408889634
    scale = D ** -0.5
    qp = q * (scale * LOG2E)
    sk, lo, hi = jnp.int32(64), jnp.int32(320), jnp.int32(576)
    ref = decode_attention_fresh_xla(qp, kc, vc, kn, vn, lo, hi,
                                     scale=math.log(2.0), sink_end=sk)
    out8 = decode_attention_fresh_pallas(
        qp, kc, vc, kn, vn, lo, hi, scale=1.0, softmax="free",
        quant="int8qk", tq=32, tk=64, interpret=True, sink_end=sk,
        window_static=(64, 256))
    d = np.abs(np.asarray(out8) - np.asarray(ref))
    assert d.mean() < 0.02, d.mean()
