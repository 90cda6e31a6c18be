"""VAE parity vs the PyTorch reference (wan/modules/vae.py) on a tiny config,
via the production weight converter (utils/checkpoints.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models.wan import vae as jvae
from self_forcing_tpu.utils.checkpoints import convert_vae_state_dict
from tests.reference_loader import load_ref_module

CFG = jvae.VAE_TINY  # dim 8, z 4, mult (1,2,2,2), 1 res block
B, T, H, W = 1, 9, 32, 32


@pytest.fixture(scope="module")
def ref_vae():
    return load_ref_module("wan/modules/vae.py", "ref_vae")


@pytest.fixture(scope="module")
def models(ref_vae):
    import torch
    torch.manual_seed(0)
    tm = ref_vae.WanVAE_(
        dim=CFG.dim, z_dim=CFG.z_dim, dim_mult=list(CFG.dim_mult),
        num_res_blocks=CFG.num_res_blocks, attn_scales=[],
        temperal_downsample=list(CFG.temperal_downsample), dropout=0.0).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_vae_state_dict(sd, CFG, dtype=jnp.float32)
    return tm, params


def test_encode_parity(models):
    import torch
    tm, params = models
    rng = np.random.default_rng(0)
    px = rng.standard_normal((B, 3, T, H, W)).astype(np.float32) * 0.5

    mean = torch.zeros(CFG.z_dim)
    inv_std = torch.ones(CFG.z_dim)
    with torch.no_grad():
        ref_mu = tm.encode(torch.tensor(px), [mean, inv_std]).numpy()

    # ours normalizes with the Wan constants; neutralize for parity by
    # re-applying them.
    px_j = jnp.asarray(px.transpose(0, 2, 3, 4, 1))  # BCTHW -> BTHWC
    lat = np.asarray(jvae.encode(params, CFG, px_j))
    mu = lat * jvae.LATENT_STD[:CFG.z_dim] + jvae.LATENT_MEAN[:CFG.z_dim]
    ref = ref_mu.transpose(0, 2, 3, 4, 1)            # BCThw -> BThwC
    np.testing.assert_allclose(mu, ref, rtol=2e-4, atol=2e-4)


def test_decode_parity(models):
    import torch
    tm, params = models
    rng = np.random.default_rng(1)
    h, w = H // 8, W // 8
    t_lat = 1 + (T - 1) // 4
    z = rng.standard_normal((B, CFG.z_dim, t_lat, h, w)).astype(np.float32)

    mean = torch.zeros(CFG.z_dim)
    inv_std = torch.ones(CFG.z_dim)
    with torch.no_grad():
        ref_px = tm.decode(torch.tensor(z), [mean, inv_std]).numpy()

    # neutralize our latent normalization (the torch call above uses
    # identity scale): decode_frame computes z*std + mean, so feed
    # (z - mean)/std.
    z_j = (z.transpose(0, 2, 3, 4, 1) - jvae.LATENT_MEAN[:CFG.z_dim]) \
        / jvae.LATENT_STD[:CFG.z_dim]
    out = np.asarray(jvae.decode(params, CFG, jnp.asarray(z_j)))
    ref = np.clip(ref_px.transpose(0, 2, 3, 4, 1), -1, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)


def test_encode_decode_shapes(models):
    _, params = models
    px = jnp.zeros((B, T, H, W, 3))
    lat = jvae.encode(params, CFG, px)
    assert lat.shape == (B, 1 + (T - 1) // 4, H // 8, W // 8, CFG.z_dim)
    out = jvae.decode(params, CFG, lat)
    assert out.shape == (B, T, H, W, 3)


@pytest.mark.slow
def test_decode_block_matches_full():
    """One-pass multi-frame block decode == frame-by-frame decode (the
    streaming fast path must be numerically identical)."""
    import jax, jax.numpy as jnp
    import numpy as np
    from self_forcing_tpu.models.wan import vae as vae_mod
    cfg = vae_mod.VAE_TINY
    params = vae_mod.init_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 4, 4, cfg.z_dim))
    full = vae_mod.decode(params, cfg, z)

    cache = vae_mod.init_decoder_cache(params, cfg, 1, 4, 4, z.dtype)
    p1, cache = vae_mod.decode_block(params, cfg, z[:, :3], cache, True)
    p2, cache = vae_mod.decode_block(params, cfg, z[:, 3:5], cache, False)
    p3, cache = vae_mod.decode_block(params, cfg, z[:, 5:], cache, False)
    streamed = jnp.clip(jnp.concatenate([p1, p2, p3], axis=1), -1, 1)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(full),
                               rtol=5e-4, atol=5e-4)


def test_pad_decoder_channels_exact():
    """Channel-padded decoder (TPU lane alignment) is numerically exact."""
    cfg = jvae.VAE_TINY
    key = jax.random.PRNGKey(5)
    params = jvae.init_params(key, cfg, dtype=jnp.float32)
    # randomize gammas so the sqrt(C/Cp) compensation is actually tested
    def jitter(p, k):
        if isinstance(p, dict):
            return {kk: jitter(v, jax.random.fold_in(k, hash(kk) % 1000))
                    for kk, v in p.items()}
        if isinstance(p, list):
            return [jitter(v, jax.random.fold_in(k, i))
                    for i, v in enumerate(p)]
        if getattr(p, "ndim", None) == 1:
            return p + 0.1 * jax.random.normal(k, p.shape)
        return p
    params["decoder"]["head_norm"] = (
        params["decoder"]["head_norm"]
        + 0.3 * jax.random.normal(key, params["decoder"]["head_norm"].shape))
    padded = jvae.pad_decoder_channels(params, align=16)
    assert padded["decoder"]["stages"][-1]["blocks"][-1]["conv2"]["w"].shape[-1] == 16
    z = jax.random.normal(jax.random.fold_in(key, 1), (1, 3, 4, 4, cfg.z_dim))
    ref = jvae.decode(params, cfg, z)
    out = jvae.decode(padded, cfg, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_multiframe_decode_frame_matches_per_frame_scan():
    """decode_frame is T-general: one multi-frame pass must equal the
    per-frame scan — causal convs see [cache | frames] either way.
    (Pins the primitive equivalence the removed sequence-decode mode
    relied on; the mode itself measured slower and was deleted, PERF.md.)"""
    cfg = jvae.VAE_TINY
    key = jax.random.PRNGKey(7)
    params = jvae.init_params(key, cfg, dtype=jnp.float32)
    B, T, h, w = 1, 7, 4, 4
    z = jax.random.normal(jax.random.fold_in(key, 1), (B, T, h, w, cfg.z_dim))

    full = jvae.decode(params, cfg, z)
    cache = jvae.init_decoder_cache(params, cfg, B, h, w, z.dtype)
    y0, cache = jvae.decode_frame(params, cfg, z[:, :1], cache, True)
    y1, cache = jvae.decode_frame(params, cfg, z[:, 1:4], cache, False)
    y2, cache = jvae.decode_frame(params, cfg, z[:, 4:], cache, False)
    seq = jnp.clip(jnp.concatenate([y0, y1, y2], axis=1), -1, 1)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


def test_fused_resblock_matches_xla_streaming(monkeypatch):
    """The fused norm+silu+conv residual block (raw-input cache semantics)
    matches the XLA path across consecutive streaming calls."""
    from self_forcing_tpu.ops import pallas_conv
    from self_forcing_tpu.ops import attention as att

    key = jax.random.PRNGKey(31)
    T, H, W, C = 2, 8, 16, 128
    p = {
        "norm1": 1.0 + 0.1 * jax.random.normal(key, (C,)),
        "norm2": 1.0 - 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (C,)),
        "conv1": {"w": 0.05 * jax.random.normal(jax.random.fold_in(key, 2), (3, 3, 3, C, C)),
                  "b": 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (C,))},
        "conv2": {"w": 0.05 * jax.random.normal(jax.random.fold_in(key, 4), (3, 3, 3, C, C)),
                  "b": 0.1 * jax.random.normal(jax.random.fold_in(key, 5), (C,))},
    }
    x1 = jax.random.normal(jax.random.fold_in(key, 6), (1, T, H, W, C))
    x2 = jax.random.normal(jax.random.fold_in(key, 7), (1, T, H, W, C))
    zc = [jnp.zeros((1, 2, H, W, C)), jnp.zeros((1, 2, H, W, C))]

    ya1, ca = jvae.residual_block(p, x1, zc)
    ya2, _ = jvae.residual_block(p, x2, ca)

    orig = pallas_conv.norm_silu_conv3d_pallas
    monkeypatch.setattr(
        pallas_conv, "norm_silu_conv3d_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(jvae, "_CONV_BACKEND", "fused")
    monkeypatch.setattr(att, "_ATTENTION_BACKEND", "pallas")
    yb1, cb = jvae.residual_block(p, x1, zc)
    yb2, _ = jvae.residual_block(p, x2, cb)

    np.testing.assert_allclose(np.asarray(yb1), np.asarray(ya1),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(yb2), np.asarray(ya2),
                               atol=2e-5, rtol=2e-5)


def test_decode_inverts_encode_normalization(models):
    """encode -> decode round-trips the normalization: decoding the
    encoder's output must match decoding with the reference's scale
    convention (regression: decode divided by std instead of multiplying,
    so every pipeline video had per-channel mis-scaled latents)."""
    import torch
    tm, params = models
    rng = np.random.default_rng(3)
    px = rng.uniform(-1, 1, (B, T, H, W, 3)).astype(np.float32)
    lat = jvae.encode(params, CFG, jnp.asarray(px))

    mean = torch.tensor(jvae.LATENT_MEAN[:CFG.z_dim])
    inv_std = 1.0 / torch.tensor(jvae.LATENT_STD[:CFG.z_dim])
    with torch.no_grad():
        z_t = torch.tensor(
            np.asarray(lat).transpose(0, 4, 1, 2, 3))
        ref_px = tm.decode(z_t, [mean, inv_std]).numpy()
    out = np.asarray(jvae.decode(params, CFG, lat))
    ref = np.clip(ref_px.transpose(0, 2, 3, 4, 1), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)
