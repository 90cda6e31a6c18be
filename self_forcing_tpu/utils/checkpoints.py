"""PyTorch checkpoint -> JAX pytree converters + orbax save/load.

The reference's checkpoint surface (SURVEY.md §2.12):
- Wan2.1 base DiT: diffusers-format directory (utils/wan_wrapper.py:139-147)
- `self_forcing_dmd.pt`: {'generator', 'generator_ema'[, 'critic']} state
  dicts with a 'model.' prefix (inference.py:70-71)
- `models_t5_umt5-xxl-enc-bf16.pth` (utils/wan_wrapper.py:26-32)
- `Wan2.1_VAE.pth` (wan/modules/vae.py:612-636)

These converters map torch state dicts (as numpy arrays) into this
framework's parameter pytrees.  Linear weights transpose [out,in]->[in,out];
convs go OIDHW -> DHWIO.  All converters are validated against the torch
reference modules in tests/.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().to("cpu").float().numpy()


def load_torch_state_dict(path: str, key: str | None = None) -> dict:
    """Load a .pth/.pt (torch.save) or .safetensors file as numpy dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(path)
        if key is not None:
            # safetensors files are flat: select a sub-dict by key prefix
            # (torch checkpoints nest instead) or fail loudly rather than
            # silently returning the whole dict
            pref = key + "."
            sub = {k[len(pref):]: v for k, v in sd.items()
                   if k.startswith(pref)}
            if not sub:
                raise KeyError(
                    f"{key!r} selects nothing in {path} (flat safetensors "
                    f"keys have no {pref}* entries)")
            sd = sub
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if key is not None:
            sd = sd[key]
    return {k: _np(v) for k, v in sd.items()}


def strip_prefix(sd: Mapping[str, Any], prefix: str = "model.") -> dict:
    return {k[len(prefix):] if k.startswith(prefix) else k: v
            for k, v in sd.items()}


def _lin(sd, name, dtype=jnp.float32) -> Params:
    p = {"w": jnp.asarray(_np(sd[name + ".weight"]).T, dtype)}
    if name + ".bias" in sd:
        p["b"] = jnp.asarray(_np(sd[name + ".bias"]), dtype)
    # LoRA adapters (utils/lora.py:12-50): lora_A [r, in], lora_B [out, r]
    if name + ".lora_A.weight" in sd:
        p["lora_A"] = jnp.asarray(_np(sd[name + ".lora_A.weight"]).T, dtype)
        p["lora_B"] = jnp.asarray(_np(sd[name + ".lora_B.weight"]).T, dtype)
        p["lora_scale"] = jnp.asarray(1.0, dtype)  # caller overrides alpha/r
    return p


def _conv3d_p(sd, name, dtype=jnp.float32) -> Params:
    w = _np(sd[name + ".weight"]).transpose(2, 3, 4, 1, 0)  # OIDHW->DHWIO
    return {"w": jnp.asarray(w, dtype),
            "b": jnp.asarray(_np(sd[name + ".bias"]), dtype)}


def _conv2d_p(sd, name, dtype=jnp.float32) -> Params:
    w = _np(sd[name + ".weight"]).transpose(2, 3, 1, 0)      # OIHW->HWIO
    return {"w": jnp.asarray(w, dtype),
            "b": jnp.asarray(_np(sd[name + ".bias"]), dtype)}


# =====================================================================
# Wan DiT
# =====================================================================

def convert_dit_state_dict(sd: Mapping[str, Any], cfg,
                           dtype=jnp.bfloat16,
                           lora_scale: float | None = None) -> Params:
    """Torch WanModel / CausalWanModel state dict -> dit.py params pytree."""
    sd = dict(sd)
    d = cfg.dim

    def lin(name):
        return _lin(sd, name, dtype)

    pe_w = _np(sd["patch_embedding.weight"])           # [D, C, 1, ph, pw]
    patch_in = int(np.prod(pe_w.shape[1:]))
    params: Params = {
        "patch_embedding": {
            "w": jnp.asarray(pe_w.reshape(d, patch_in).T, dtype),
            "b": jnp.asarray(_np(sd["patch_embedding.bias"]), dtype),
        },
        "text_embedding": {"fc1": lin("text_embedding.0"),
                           "fc2": lin("text_embedding.2")},
        "time_embedding": {"fc1": lin("time_embedding.0"),
                           "fc2": lin("time_embedding.2")},
        "time_projection": {"fc": lin("time_projection.1")},
        "head": {
            "head": lin("head.head"),
            "modulation": jnp.asarray(_np(sd["head.modulation"]), dtype),
        },
    }

    # Self-attention q/k columns are stored in the RoPE half layout
    # (rope.qk_half_perm): QK^T is invariant, and the rotation becomes
    # lane-aligned FMAs instead of a minor-dim-2 relayout chain.
    from self_forcing_tpu.models.wan.rope import qk_half_perm
    rope_perm = qk_half_perm(cfg.head_dim, cfg.num_heads)

    def attn(prefix, cross):
        p = {"q": lin(prefix + ".q"), "k": lin(prefix + ".k"),
             "v": lin(prefix + ".v"), "o": lin(prefix + ".o")}
        if not cross:
            for proj in ("q", "k"):
                p[proj]["w"] = p[proj]["w"][:, rope_perm]
                if "b" in p[proj]:
                    p[proj]["b"] = p[proj]["b"][rope_perm]
        if cfg.qk_norm:
            p["norm_q"] = {"w": jnp.asarray(_np(sd[prefix + ".norm_q.weight"]), dtype)}
            p["norm_k"] = {"w": jnp.asarray(_np(sd[prefix + ".norm_k.weight"]), dtype)}
            if not cross:
                p["norm_q"]["w"] = p["norm_q"]["w"][rope_perm]
                p["norm_k"]["w"] = p["norm_k"]["w"][rope_perm]
        if cross and prefix + ".k_img.weight" in sd:
            p["k_img"] = lin(prefix + ".k_img")
            p["v_img"] = lin(prefix + ".v_img")
            if cfg.qk_norm:
                p["norm_k_img"] = {
                    "w": jnp.asarray(_np(sd[prefix + ".norm_k_img.weight"]), dtype)}
        return p

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        bp = {
            "self_attn": attn(pre + ".self_attn", False),
            "cross_attn": attn(pre + ".cross_attn", True),
            "ffn": {"fc1": lin(pre + ".ffn.0"), "fc2": lin(pre + ".ffn.2")},
            "modulation": jnp.asarray(_np(sd[pre + ".modulation"]), dtype),
        }
        if cfg.cross_attn_norm:
            bp["norm3"] = {
                "w": jnp.asarray(_np(sd[pre + ".norm3.weight"]), dtype),
                "b": jnp.asarray(_np(sd[pre + ".norm3.bias"]), dtype)}
        blocks.append(bp)
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    if "pose_proj.weight" in sd:
        params["pose_proj"] = lin("pose_proj")
    if "img_emb.proj.0.weight" in sd:
        params["img_emb"] = {
            "norm1": {"w": jnp.asarray(_np(sd["img_emb.proj.0.weight"]), dtype),
                      "b": jnp.asarray(_np(sd["img_emb.proj.0.bias"]), dtype)},
            "fc1": lin("img_emb.proj.1"),
            "fc2": lin("img_emb.proj.3"),
            "norm2": {"w": jnp.asarray(_np(sd["img_emb.proj.4.weight"]), dtype),
                      "b": jnp.asarray(_np(sd["img_emb.proj.4.bias"]), dtype)},
        }

    if lora_scale is not None:
        def set_scale(p):
            if isinstance(p, dict):
                if "lora_scale" in p:
                    p["lora_scale"] = jnp.asarray(lora_scale, dtype)
                for v in p.values():
                    set_scale(v)
        set_scale(params)
    return params


# =====================================================================
# T5 encoder
# =====================================================================

def convert_t5_state_dict(sd: Mapping[str, Any], cfg,
                          dtype=jnp.bfloat16) -> Params:
    """Torch T5Encoder state dict (wan/modules/t5.py) -> t5.py pytree."""
    def lin(name):
        return {"w": jnp.asarray(_np(sd[name + ".weight"]).T, dtype)}

    blocks = []
    for i in range(cfg.num_layers):
        p = f"blocks.{i}."
        blocks.append({
            "norm1": {"w": jnp.asarray(_np(sd[p + "norm1.weight"]), dtype)},
            "attn": {"q": lin(p + "attn.q"), "k": lin(p + "attn.k"),
                     "v": lin(p + "attn.v"), "o": lin(p + "attn.o")},
            "norm2": {"w": jnp.asarray(_np(sd[p + "norm2.weight"]), dtype)},
            "ffn": {"gate": lin(p + "ffn.gate.0"), "fc1": lin(p + "ffn.fc1"),
                    "fc2": lin(p + "ffn.fc2")},
            "pos_emb": jnp.asarray(
                _np(sd[p + "pos_embedding.embedding.weight"]), jnp.float32),
        })
    return {
        "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"]), dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": jnp.asarray(_np(sd["norm.weight"]), dtype)},
    }


# =====================================================================
# VAE
# =====================================================================

def convert_vae_state_dict(sd: Mapping[str, Any], cfg,
                           dtype=jnp.float32) -> Params:
    """Torch WanVAE_ state dict (wan/modules/vae.py:483-509) -> vae.py pytree."""
    def gamma(name):
        return jnp.asarray(_np(sd[name + ".gamma"]).reshape(-1), dtype)

    def res(prefix):
        p = {
            "norm1": gamma(prefix + ".residual.0"),
            "conv1": _conv3d_p(sd, prefix + ".residual.2", dtype),
            "norm2": gamma(prefix + ".residual.3"),
            "conv2": _conv3d_p(sd, prefix + ".residual.6", dtype),
        }
        if prefix + ".shortcut.weight" in sd:
            p["shortcut"] = _conv3d_p(sd, prefix + ".shortcut", dtype)
        return p

    def attn(prefix):
        qkv_w = _np(sd[prefix + ".to_qkv.weight"])  # [3C, C, 1, 1]
        proj_w = _np(sd[prefix + ".proj.weight"])
        return {
            "norm": gamma(prefix + ".norm"),
            "to_qkv": {"w": jnp.asarray(qkv_w[:, :, 0, 0].T, dtype),
                       "b": jnp.asarray(_np(sd[prefix + ".to_qkv.bias"]), dtype)},
            "proj": {"w": jnp.asarray(proj_w[:, :, 0, 0].T, dtype),
                     "b": jnp.asarray(_np(sd[prefix + ".proj.bias"]), dtype)},
        }

    n_stages = len(cfg.dim_mult)

    def tower(side: str, num_res: int, temporal_flags) -> Params:
        """side: 'encoder'/'downsamples' or 'decoder'/'upsamples'."""
        mod, seq = ("encoder", "downsamples") if side == "encoder" \
            else ("decoder", "upsamples")
        out: Params = {"conv1": _conv3d_p(sd, f"{mod}.conv1", dtype)}
        out["mid_res1"] = res(f"{mod}.middle.0")
        out["mid_attn"] = attn(f"{mod}.middle.1")
        out["mid_res2"] = res(f"{mod}.middle.2")
        stages = []
        idx = 0
        for i in range(n_stages):
            blocks = []
            for _ in range(num_res):
                blocks.append(res(f"{mod}.{seq}.{idx}"))
                idx += 1
            stage: Params = {"blocks": blocks}
            if i != n_stages - 1:
                rs = f"{mod}.{seq}.{idx}"
                idx += 1
                # resample Sequential: upsample = [Upsample, Conv2d] ->
                # conv at .1; downsample = [ZeroPad2d, Conv2d] -> conv at .1
                stage["resample"] = {"conv": _conv2d_p(sd, rs + ".resample.1", dtype)}
                if temporal_flags[i]:
                    stage["resample"]["time_conv"] = _conv3d_p(
                        sd, rs + ".time_conv", dtype)
            stages.append(stage)
        out["stages"] = stages
        out["head_norm"] = gamma(f"{mod}.head.0")
        out["head_conv"] = _conv3d_p(sd, f"{mod}.head.2", dtype)
        return out

    return {
        "encoder": tower("encoder", cfg.num_res_blocks, cfg.temperal_downsample),
        "conv1": _conv3d_p(sd, "conv1", dtype),
        "conv2": _conv3d_p(sd, "conv2", dtype),
        "decoder": tower("decoder", cfg.num_res_blocks + 1, cfg.temperal_upsample),
    }


# =====================================================================
# orbax save / load (TPU-side checkpoints)
# =====================================================================

def save_pytree(path: str, tree) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_pytree(path: str, like=None):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)


# =====================================================================
# Export: dit.py pytree -> reference torch state dict (the inverse of
# convert_dit_state_dict, so checkpoints trained here load into the
# reference WanModel/CausalWanModel with strict=True — "train on TPU,
# deploy on the reference" interchange, SURVEY.md §2.12)
# =====================================================================

def export_dit_state_dict(params: Params, cfg) -> dict:
    """dit.py params pytree -> {reference torch name: np.float32 array}.

    Inverts every convert_dit_state_dict transform: linear transposes,
    the patch-embedding flatten, the RoPE half-layout column permutation
    on self-attention q/k (+ their norms), and the stacked-blocks layout.
    LoRA adapters export under the reference lora_A/lora_B names.
    Quantized (W8A8) params cannot be exported — dequantize/reload the
    float checkpoint instead."""
    def arr(x):
        a = np.asarray(jax.device_get(x))
        if a.dtype not in (np.float32, np.float16):
            a = a.astype(np.float32)
        return a

    def put_lin(out, name, p):
        if "w_int8" in p or "scale" in p:
            raise ValueError(f"{name}: quantized linear cannot be "
                             "exported to the reference layout")
        out[name + ".weight"] = arr(p["w"]).T.copy()
        if "b" in p:
            out[name + ".bias"] = arr(p["b"])
        if "lora_A" in p:
            out[name + ".lora_A.weight"] = arr(p["lora_A"]).T.copy()
            out[name + ".lora_B.weight"] = arr(p["lora_B"]).T.copy()

    from self_forcing_tpu.models.wan.rope import qk_half_perm
    inv_perm = np.argsort(qk_half_perm(cfg.head_dim, cfg.num_heads))

    sd: dict = {}
    pe = arr(params["patch_embedding"]["w"])       # [patch_in, D]
    pf, ph, pw = cfg.patch_size
    sd["patch_embedding.weight"] = pe.T.reshape(
        cfg.dim, cfg.in_dim, pf, ph, pw).copy()
    sd["patch_embedding.bias"] = arr(params["patch_embedding"]["b"])
    put_lin(sd, "text_embedding.0", params["text_embedding"]["fc1"])
    put_lin(sd, "text_embedding.2", params["text_embedding"]["fc2"])
    put_lin(sd, "time_embedding.0", params["time_embedding"]["fc1"])
    put_lin(sd, "time_embedding.2", params["time_embedding"]["fc2"])
    put_lin(sd, "time_projection.1", params["time_projection"]["fc"])
    put_lin(sd, "head.head", params["head"]["head"])
    sd["head.modulation"] = arr(params["head"]["modulation"])

    def put_attn(out, prefix, p, cross):
        q, k = dict(p["q"]), dict(p["k"])
        nq = dict(p["norm_q"]) if "norm_q" in p else None
        nk = dict(p["norm_k"]) if "norm_k" in p else None
        if not cross:  # undo the RoPE half-layout column permutation
            q["w"] = q["w"][:, inv_perm]
            k["w"] = k["w"][:, inv_perm]
            if "b" in q:
                q["b"] = q["b"][inv_perm]
            if "b" in k:
                k["b"] = k["b"][inv_perm]
            if nq is not None:
                nq["w"] = nq["w"][inv_perm]
            if nk is not None:
                nk["w"] = nk["w"][inv_perm]
        put_lin(out, prefix + ".q", q)
        put_lin(out, prefix + ".k", k)
        put_lin(out, prefix + ".v", p["v"])
        put_lin(out, prefix + ".o", p["o"])
        if nq is not None:
            out[prefix + ".norm_q.weight"] = arr(nq["w"])
            out[prefix + ".norm_k.weight"] = arr(nk["w"])
        if cross and "k_img" in p:
            put_lin(out, prefix + ".k_img", p["k_img"])
            put_lin(out, prefix + ".v_img", p["v_img"])
            if "norm_k_img" in p:
                out[prefix + ".norm_k_img.weight"] = arr(
                    p["norm_k_img"]["w"])

    blocks = params["blocks"]
    num_layers = int(jax.tree.leaves(blocks)[0].shape[0])
    for i in range(num_layers):
        bp = jax.tree.map(lambda x: x[i], blocks)
        pre = f"blocks.{i}"
        put_attn(sd, pre + ".self_attn", bp["self_attn"], cross=False)
        put_attn(sd, pre + ".cross_attn", bp["cross_attn"], cross=True)
        put_lin(sd, pre + ".ffn.0", bp["ffn"]["fc1"])
        put_lin(sd, pre + ".ffn.2", bp["ffn"]["fc2"])
        sd[pre + ".modulation"] = arr(bp["modulation"])
        if "norm3" in bp:
            sd[pre + ".norm3.weight"] = arr(bp["norm3"]["w"])
            sd[pre + ".norm3.bias"] = arr(bp["norm3"]["b"])

    if "pose_proj" in params:
        put_lin(sd, "pose_proj", params["pose_proj"])
    if "img_emb" in params:
        ie = params["img_emb"]
        sd["img_emb.proj.0.weight"] = arr(ie["norm1"]["w"])
        sd["img_emb.proj.0.bias"] = arr(ie["norm1"]["b"])
        put_lin(sd, "img_emb.proj.1", ie["fc1"])
        put_lin(sd, "img_emb.proj.3", ie["fc2"])
        sd["img_emb.proj.4.weight"] = arr(ie["norm2"]["w"])
        sd["img_emb.proj.4.bias"] = arr(ie["norm2"]["b"])
    return sd


def save_reference_checkpoint(path: str, trees: Mapping[str, Params],
                              cfg, dtype=None) -> None:
    """torch.save a reference-layout checkpoint, e.g.
    {'generator': ..., 'generator_ema': ..., 'critic': ...} — the
    self_forcing_dmd.pt contract (reference trainer/distillation.py:
    203-228, inference.py:70-71)."""
    import torch
    out = {}
    for key, params in trees.items():
        sd = export_dit_state_dict(params, cfg)
        tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
        if dtype is not None:
            tsd = {k: v.to(dtype) for k, v in tsd.items()}
        out[key] = tsd
    torch.save(out, path)
