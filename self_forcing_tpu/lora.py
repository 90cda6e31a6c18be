"""LoRA adapters as pytree entries (reference utils/lora.py).

In this framework a LoRA'd linear is just extra keys in its param dict —
``lora_A`` [in, r], ``lora_B`` [r, out], ``lora_scale`` (alpha/r) — which
``models.wan.dit.linear`` applies fused: out += (x @ A) @ B * scale
(reference LoRALinear, utils/lora.py:12-50; dropout is a no-op at
inference and omitted — the reference trains with dropout 0 in the
shipped configs).

Provided here:
- :func:`apply_lora` — attach zero-init adapters to the reference's
  target set: self/cross attention q/k/v/o + ffn in/out
  (utils/lora.py:100-141).
- :func:`load_lora_weights` — key remapping across diffusers / peft /
  native formats (utils/lora.py:144-222).
- :func:`lora_label_tree` — optax.multi_transform labels realizing
  mark_only_lora_as_trainable (+ pose_proj, utils/lora.py:225-234).
- :func:`merge_lora` — fold adapters into base weights
  (scripts/merge_lora.py equivalent).
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

# target linear dict paths inside each block (utils/lora.py:100-141)
TARGET_LINEARS = (
    ("self_attn", "q"), ("self_attn", "k"), ("self_attn", "v"),
    ("self_attn", "o"),
    ("cross_attn", "q"), ("cross_attn", "k"), ("cross_attn", "v"),
    ("cross_attn", "o"),
    ("ffn", "fc1"), ("ffn", "fc2"),
)


def _resolve_targets(targets) -> tuple:
    """Map the reference's lora_targets aliases (q/k/v/o apply to both
    attention modules, ffn.0/ffn.2 to the FFN linears —
    utils/lora.py:100-141) to (module, proj) paths."""
    if targets is None:
        return TARGET_LINEARS
    out = []
    for t in targets:
        t = str(t)
        if t in ("q", "k", "v", "o"):
            out += [("self_attn", t), ("cross_attn", t)]
        elif t == "ffn.0":
            out.append(("ffn", "fc1"))
        elif t == "ffn.2":
            out.append(("ffn", "fc2"))
        else:
            raise ValueError(f"unknown lora target {t!r}")
    return tuple(out)


def apply_lora(params: Params, rank: int = 16, alpha: float = 16.0,
               key: jax.Array | None = None, dtype=jnp.float32,
               targets=None) -> Params:
    """Attach adapters to the target linears in params['blocks']
    (default: the reference's full q/k/v/o + ffn set).

    A ~ N(0, 1/r) (kaiming-ish), B zero — so the model output is unchanged
    at init (utils/lora.py:37-44).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    blocks = params["blocks"]
    new_blocks = jax.tree.map(lambda x: x, blocks)  # shallow-ish copy
    for i, path in enumerate(_resolve_targets(targets)):
        node = new_blocks
        for p in path[:-1]:
            node = node[p]
        leaf = dict(node[path[-1]])
        w = leaf["w"]          # [L, in, out] (stacked blocks)
        L, d_in, d_out = w.shape
        k = jax.random.fold_in(key, i)
        leaf["lora_A"] = (jax.random.normal(k, (L, d_in, rank))
                          / np.sqrt(rank)).astype(dtype)
        leaf["lora_B"] = jnp.zeros((L, rank, d_out), dtype)
        leaf["lora_scale"] = jnp.full((L,), alpha / rank, dtype)
        node[path[-1]] = leaf
    out = dict(params)
    out["blocks"] = new_blocks
    return out


def _leaf_for_target(params: Params, layer: int, module: str, proj: str):
    return params["blocks"][module][proj]


_PROJ_ALIASES = {
    "q": ("self_attn", "q"), "k": ("self_attn", "k"),
    "v": ("self_attn", "v"), "o": ("self_attn", "o"),
    "ffn.0": ("ffn", "fc1"), "ffn.2": ("ffn", "fc2"),
}


def load_lora_weights(params: Params, state_dict: Mapping[str, Any],
                      alpha: float | None = None,
                      dtype=jnp.float32,
                      head_dim: int = 128) -> Params:
    """Load torch LoRA weights into the stacked-blocks pytree.

    Handles the reference's key formats (utils/lora.py:144-222):
    - native:   blocks.{i}.self_attn.q.lora_A.weight  [r, in]
    - diffusers: ...lora_A.default.weight / lora.down.weight
    - peft:     base_model.model.blocks.{i}...lora_A.weight
    """
    def _np(t):
        return t if isinstance(t, np.ndarray) else \
            t.detach().to("cpu").float().numpy()

    # collect per (layer, module, proj): {"A": arr, "B": arr}
    found: dict[tuple, dict] = {}
    for k, v in state_dict.items():
        kk = k
        for prefix in ("base_model.model.", "diffusion_model.", "model."):
            if kk.startswith(prefix):
                kk = kk[len(prefix):]
        if not kk.startswith("blocks.") or "lora" not in kk:
            continue
        parts = kk.split(".")
        layer = int(parts[1])
        rest = ".".join(parts[2:])
        # identify proj + A/B
        if "lora_A" in rest or "lora.down" in rest:
            ab = "A"
        elif "lora_B" in rest or "lora.up" in rest:
            ab = "B"
        else:
            continue
        for alias, path in _PROJ_ALIASES.items():
            token = f"{alias}." if not alias.startswith("ffn") else alias
            if rest.startswith(f"self_attn.{alias}.") or \
               rest.startswith(f"cross_attn.{alias}.") or \
               rest.startswith(token):
                if rest.startswith("cross_attn."):
                    path = ("cross_attn", alias)
                found.setdefault((layer,) + tuple(path), {})[ab] = _np(v)
                break

    if not found:
        raise ValueError("no LoRA weights matched the blocks.* layout")

    # organize into stacked arrays per target
    num_layers = params["blocks"]["modulation"].shape[0]
    out = jax.tree.map(lambda x: x, params)
    targets = {}
    for (layer, module, proj), ab in found.items():
        targets.setdefault((module, proj), {})[layer] = ab

    for (module, proj), per_layer in targets.items():
        leaf = dict(out["blocks"][module][proj])
        any_a = next(iter(per_layer.values()))["A"]
        r = any_a.shape[0]
        d_in = leaf["w"].shape[1]
        d_out = leaf["w"].shape[2]
        A = np.zeros((num_layers, d_in, r), np.float32)
        B = np.zeros((num_layers, r, d_out), np.float32)
        for layer, ab in per_layer.items():
            A[layer] = ab["A"].T    # torch [r, in] -> [in, r]
            B[layer] = ab["B"].T    # torch [out, r] -> [r, out]
        if module == "self_attn" and proj in ("q", "k"):
            # base q/k columns live in the RoPE half layout
            # (rope.qk_half_perm, utils/checkpoints.py) — the LoRA B
            # columns must be permuted identically.  head_dim must match
            # the model's (128 for all production Wan variants; pass
            # cfg.head_dim for toy/TP-local configs or the permutation
            # silently scrambles q/k deltas).
            from self_forcing_tpu.models.wan.rope import qk_half_perm
            assert d_out % head_dim == 0, (d_out, head_dim)
            B = B[:, :, qk_half_perm(head_dim, d_out // head_dim)]
        leaf["lora_A"] = jnp.asarray(A, dtype)
        leaf["lora_B"] = jnp.asarray(B, dtype)
        scale = (alpha / r) if alpha is not None else 1.0
        leaf["lora_scale"] = jnp.full((num_layers,), scale, dtype)
        out["blocks"][module][proj] = leaf
    return out


def has_lora(params: Params) -> bool:
    """True when any adapter is already attached."""
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        if any(getattr(p, "key", None) == "lora_A" for p in path):
            return True
    return False


def lora_label_tree(params: Params, train_pose_proj: bool = True) -> Params:
    """Label pytree for optax.multi_transform: 'train' for lora_A/B (and
    pose_proj when present), 'frozen' otherwise
    (mark_only_lora_as_trainable, utils/lora.py:225-234)."""
    def label(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "lora_A" in keys or "lora_B" in keys:
            return "train"
        if train_pose_proj and "pose_proj" in keys:
            return "train"
        return "frozen"
    return jax.tree_util.tree_map_with_path(label, params)


def merge_lora(params: Params) -> Params:
    """Fold B·A·scale into the base weights and drop the adapters
    (scripts/merge_lora.py)."""
    def merge_node(node):
        if isinstance(node, dict):
            if "lora_A" in node and "w" in node:
                A, B = node["lora_A"], node["lora_B"]
                scale = node["lora_scale"]
                delta = jnp.einsum("lir,lro->lio", A, B) \
                    * scale[:, None, None] if A.ndim == 3 else (A @ B) * scale
                new = {k: v for k, v in node.items()
                       if k not in ("lora_A", "lora_B", "lora_scale")}
                new["w"] = (node["w"].astype(jnp.float32)
                            + delta.astype(jnp.float32)).astype(node["w"].dtype)
                return new
            return {k: merge_node(v) for k, v in node.items()}
        if isinstance(node, list):
            return [merge_node(v) for v in node]
        return node
    return merge_node(params)
