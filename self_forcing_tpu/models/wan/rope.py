"""3D rotary position embedding for the Wan DiT, TPU-native.

The reference computes per-sample complex RoPE in float64 inside the forward
pass (wan/modules/model.py:29-67, causal_model.py:28-56).  On TPU we
precompute float32 cos/sin tables on the host (in float64, then cast) and
apply the rotation with two fused multiply-adds; the frame axis is offset by
``start_frame`` with a dynamic slice, which is what makes the causal
streaming path (causal_rope_apply, causal_model.py:28-56) jittable inside a
scan over blocks.

Frequency split across the head dim (model.py:606-613): for head_dim d,
frame gets d - 4*(d//6) dims, height and width get 2*(d//6) each
(44/42/42 for d=128).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_POS = 1024  # table length per axis, reference model.py:608-612


def _freqs(dim: int, theta: float = 10000.0) -> np.ndarray:
    """Rotation angles per position: outer(arange(MAX_POS), 1/theta^(2i/dim))."""
    inv = 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)
    return np.outer(np.arange(MAX_POS, dtype=np.float64), inv)  # [P, dim/2]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RopeTables:
    """cos/sin tables per axis; pairs split (f, h, w)."""

    cos_f: jax.Array  # [MAX_POS, df/2]
    sin_f: jax.Array
    cos_h: jax.Array  # [MAX_POS, dh/2]
    sin_h: jax.Array
    cos_w: jax.Array  # [MAX_POS, dw/2]
    sin_w: jax.Array

    def tree_flatten(self):
        return ((self.cos_f, self.sin_f, self.cos_h, self.sin_h,
                 self.cos_w, self.sin_w), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, head_dim: int) -> "RopeTables":
        d = head_dim
        df = d - 4 * (d // 6)          # 44 for d=128
        dh = dw = 2 * (d // 6)         # 42 for d=128
        af, ah, aw = _freqs(df), _freqs(dh), _freqs(dw)
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return cls(f32(np.cos(af)), f32(np.sin(af)),
                   f32(np.cos(ah)), f32(np.sin(ah)),
                   f32(np.cos(aw)), f32(np.sin(aw)))

    def angles_for_grid(self, f: int, h: int, w: int,
                        start_frame: jax.Array | int = 0
                        ) -> tuple[jax.Array, jax.Array]:
        """Per-token (cos, sin) of shape [f*h*w, head_dim/2].

        Grid dims are static; ``start_frame`` may be a traced scalar
        (dynamic slice on the frame table) — the causal_rope_apply offset
        (causal_model.py:44).

        Beyond MAX_POS-f frames (1024 latents ~ 4096 pixel frames ~ 4.5
        min of 16-fps stream) dynamic_slice CLAMPS the start: further
        frames reuse the last temporal positions (a graceful RoPE
        plateau — within the 12-frame streaming window relative offsets
        stay ~correct).  The reference has the same 1024-entry table and
        CRASHES there instead (freqs[start:start+f] comes back short,
        causal_model.py:44-52).
        """
        cf = jax.lax.dynamic_slice_in_dim(self.cos_f, start_frame, f, axis=0)
        sf = jax.lax.dynamic_slice_in_dim(self.sin_f, start_frame, f, axis=0)
        ch, sh = self.cos_h[:h], self.sin_h[:h]
        cw, sw = self.cos_w[:w], self.sin_w[:w]

        def combine(tf, th, tw):
            # [f,1,1,df] ⊕ [1,h,1,dh] ⊕ [1,1,w,dw] -> [f*h*w, d/2]
            a = jnp.broadcast_to(tf[:, None, None, :], (f, h, w, tf.shape[-1]))
            b = jnp.broadcast_to(th[None, :, None, :], (f, h, w, th.shape[-1]))
            c = jnp.broadcast_to(tw[None, None, :, :], (f, h, w, tw.shape[-1]))
            return jnp.concatenate([a, b, c], axis=-1).reshape(f * h * w, -1)

        return combine(cf, ch, cw), combine(sf, sh, sw)


@partial(jax.jit, static_argnames=("grid",))
def apply_rope(x: jax.Array, tables: RopeTables, grid: tuple[int, int, int],
               start_frame: jax.Array | int = 0) -> jax.Array:
    """Rotate adjacent pairs of x by the 3D RoPE angles.

    x: [B, L, N, D] with L == f*h*w; returns same shape/dtype.
    Matches reference rope_apply's complex multiply
    (model.py:52-63: pairs are adjacent in the last dim).
    """
    f, h, w = grid
    B, L, N, D = x.shape
    assert L == f * h * w, (L, grid)
    cos, sin = tables.angles_for_grid(f, h, w, start_frame)
    cos = cos[None, :, None, :]   # [1, L, 1, D/2]
    sin = sin[None, :, None, :]
    xf = x.astype(jnp.float32).reshape(B, L, N, D // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    y0 = x0 * cos - x1 * sin
    y1 = x0 * sin + x1 * cos
    out = jnp.stack([y0, y1], axis=-1).reshape(B, L, N, D)
    return out.astype(x.dtype)


def qk_half_perm(head_dim: int, num_heads: int) -> np.ndarray:
    """Column permutation taking interleaved RoPE pairs to a half layout.

    The reference rotates adjacent feature pairs (2i, 2i+1) per head
    (model.py:52-63).  On TPU the minor-dim-2 pair layout costs ~15 ms of
    relayout copies per DiT forward, so q/k projection columns (and their
    RMS-norm weights) are stored permuted per head — pair element 0 at
    position i, element 1 at i + head_dim/2 — and RoPE becomes the
    lane-friendly ``x*cos + rotate_half(x)*sin`` (dit._rope_half).  QK^T
    is invariant under any shared q/k feature permutation, so model
    outputs are unchanged.  Applied in checkpoints.convert_dit_state_dict
    and lora.load_lora_weights; random init needs no permutation.
    """
    half = np.empty(head_dim, np.int64)
    half[:head_dim // 2] = np.arange(0, head_dim, 2)
    half[head_dim // 2:] = np.arange(1, head_dim, 2)
    return (np.arange(num_heads)[:, None] * head_dim
            + half[None, :]).reshape(-1)


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    """[cos | sin] sinusoidal time embedding (model.py:15-25).

    position: [...] -> [..., dim] float32.
    """
    assert dim % 2 == 0
    half = dim // 2
    pos = position.astype(jnp.float32).reshape(-1)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = pos[:, None] * freqs[None, :]
    out = jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)
    return out.reshape(*position.shape, dim)
