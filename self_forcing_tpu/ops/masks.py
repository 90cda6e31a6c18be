"""Attention mask specifications for the causal Wan DiT.

The reference builds three flex-attention BlockMask families
(wan/modules/causal_model.py:518-723):

1. block-causal            — _prepare_blockwise_causal_attn_mask (:518-574)
2. block-causal, i2v       — _prepare_blockwise_causal_attn_mask_i2v (:664-723)
   (independent first frame, then blocks of N frames)
3. teacher forcing         — _prepare_teacher_forcing_mask (:576-662)
   over a doubled [clean | noisy] sequence.

All three are data-independent given (num_frames, frame_seqlen,
num_frame_per_block, local_attn_size).  Instead of a materialized [S, S]
mask (32760² is far too big) we encode each family as *two index intervals
per query position*:

    visible(q, j) = (start1[q] <= j < end1[q]) or (start2[q] <= j < end2[q])

which both the pure-XLA chunked attention and the Pallas flash kernel
consume.  Interval arrays are tiny ([S] i32) and computed with numpy on the
host (static geometry).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True, eq=False)
class IntervalMask:
    """Per-query visibility as union of two [start, end) KV intervals.

    Backed by *numpy* arrays and registered as a static pytree (all data in
    aux): mask geometry is compile-time constant, which lets the Pallas
    kernel precompute tile liveness on the host and makes each distinct
    mask one jit specialization (like the reference's cached BlockMasks,
    causal_model.py:546-560)."""

    start1: np.ndarray  # [S] i32
    end1: np.ndarray    # [S] i32
    start2: np.ndarray  # [S] i32
    end2: np.ndarray    # [S] i32

    def tree_flatten(self):
        aux = tuple(np.asarray(a, np.int32).tobytes()
                    for a in (self.start1, self.end1, self.start2, self.end2))
        return ((), aux)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*(np.frombuffer(b, np.int32) for b in aux))

    def __hash__(self):
        return hash(tuple(a.tobytes() for a in
                          (self.start1, self.end1, self.start2, self.end2)))

    def __eq__(self, other):
        return (isinstance(other, IntervalMask)
                and all(np.array_equal(a, b) for a, b in
                        zip((self.start1, self.end1, self.start2, self.end2),
                            (other.start1, other.end1, other.start2,
                             other.end2))))

    @property
    def seq_len(self) -> int:
        return self.start1.shape[0]

    def visible(self, q_idx: jax.Array, kv_idx: jax.Array) -> jax.Array:
        """Boolean visibility for broadcastable index arrays."""
        s1, e1 = self.start1[q_idx], self.end1[q_idx]
        s2, e2 = self.start2[q_idx], self.end2[q_idx]
        return (((kv_idx >= s1) & (kv_idx < e1))
                | ((kv_idx >= s2) & (kv_idx < e2)))

    def materialize(self) -> jax.Array:
        """Full [S, S] bool mask — for tests / tiny geometries only."""
        q = jnp.arange(self.seq_len)[:, None]
        j = jnp.arange(self.seq_len)[None, :]
        return self.visible(q, j)


def _from_numpy(s1, e1, s2=None, e2=None) -> IntervalMask:
    z = np.zeros_like(s1) if s2 is None else s2
    z2 = np.zeros_like(e1) if e2 is None else e2
    return IntervalMask(
        np.asarray(s1, np.int32), np.asarray(e1, np.int32),
        np.asarray(z, np.int32), np.asarray(z2, np.int32))


def _self_visibility(idx, starts, ends):
    """The reference masks all include '| (q_idx == kv_idx)'
    (causal_model.py:549-552,699-704): with local_attn_size smaller than
    the block, early-block queries fall outside their own window and the
    row would otherwise be fully masked.  Encode the diagonal as the
    second interval [q, q+1) exactly where interval1 misses it."""
    covered = (starts <= idx) & (idx < ends)
    s2 = np.where(covered, 0, idx)
    e2 = np.where(covered, 0, idx + 1)
    return s2, e2


def block_causal_mask(num_frames: int, frame_seqlen: int,
                      num_frame_per_block: int = 1,
                      local_attn_size: int = -1) -> IntervalMask:
    """Block-wise causal mask (causal_model.py:518-574).

    Each query attends to every token up to the end of its own
    num_frame_per_block-frame chunk; with a local window, only the last
    ``local_attn_size`` frames of that range.
    """
    total = num_frames * frame_seqlen
    block = frame_seqlen * num_frame_per_block
    idx = np.arange(total, dtype=np.int64)
    ends = (idx // block + 1) * block
    ends = np.minimum(ends, total)
    if local_attn_size == -1:
        starts = np.zeros_like(ends)
    else:
        starts = np.maximum(ends - local_attn_size * frame_seqlen, 0)
    return _from_numpy(starts, ends, *_self_visibility(idx, starts, ends))


def block_causal_mask_i2v(num_frames: int, frame_seqlen: int,
                          num_frame_per_block: int = 4,
                          local_attn_size: int = -1) -> IntervalMask:
    """[1 frame][N frames][N frames]... variant (causal_model.py:664-723)."""
    total = num_frames * frame_seqlen
    block = frame_seqlen * num_frame_per_block
    idx = np.arange(total, dtype=np.int64)
    first = idx < frame_seqlen
    rest = idx - frame_seqlen
    ends = np.where(first, frame_seqlen,
                    frame_seqlen + (rest // block + 1) * block)
    ends = np.minimum(ends, total)
    if local_attn_size == -1:
        starts = np.zeros_like(ends)
    else:
        starts = np.maximum(ends - local_attn_size * frame_seqlen, 0)
    return _from_numpy(starts, ends, *_self_visibility(idx, starts, ends))


def teacher_forcing_mask(num_frames: int, frame_seqlen: int,
                         num_frame_per_block: int = 1) -> IntervalMask:
    """Mask over a doubled [clean | noisy] sequence
    (causal_model.py:576-662).

    - clean queries (q < S): block-causal over the clean half.
    - noisy queries (q >= S): attend to clean tokens of strictly previous
      blocks [0, block_index*block) plus their own noisy block.
    """
    S = num_frames * frame_seqlen
    block = frame_seqlen * num_frame_per_block
    idx = np.arange(2 * S, dtype=np.int64)

    # clean half: interval1 = [0, block_end)
    clean_ends = np.minimum((idx // block + 1) * block, S)

    # noisy half
    noisy_rel = idx - S
    block_index = noisy_rel // block
    noise_ctx_end = block_index * block                 # clean context
    noise_self_start = S + block_index * block          # own noisy block
    noise_self_end = S + (block_index + 1) * block

    is_noisy = idx >= S
    start1 = np.zeros_like(idx)
    end1 = np.where(is_noisy, noise_ctx_end, clean_ends)
    start2 = np.where(is_noisy, noise_self_start, 0)
    end2 = np.where(is_noisy, np.minimum(noise_self_end, 2 * S), 0)
    return _from_numpy(start1, end1, start2, end2)
