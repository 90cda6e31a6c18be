"""Wan model size configs (reference wan/configs/*.py, EasyDicts).

- Wan2.1-T2V-1.3B: dim 1536, 30 layers, 12 heads, ffn 8960
  (wan/configs/wan_t2v_1_3B.py:16-29)
- Wan2.1 14B: dim 5120, 40 layers, 40 heads, ffn 13824
- tiny: CPU-testable geometry in the spirit of configs/tiny_test.yaml
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class WanConfig:
    model_type: str = "t2v"          # 't2v' | 'i2v'
    patch_size: tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 1536
    ffn_dim: int = 8960
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 12
    num_layers: int = 30
    local_attn_size: int = -1        # frames; -1 = global (causal_model.py:77)
    sink_size: int = 0
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    # causal-specific runtime knobs (causal_model.py:512-513)
    num_frame_per_block: int = 1
    independent_first_frame: bool = False
    # demo-config speed toggle: 'int8' runs the decode self-attention
    # matmuls on the MXU int8 path (the attention analog of the reference
    # demo's FP8 linears, demo.py:277-283); None = full-precision parity
    attn_quant: str | None = None
    # Attention softmax mode (decode path; TPU kernels only):
    # 'free' (default) — offset-free base-2 softmax: scale*log2(e) is
    #   folded into the q-norm gain and the kernel computes p = 2^s with
    #   no stability offset at all (softmax needs a max only for range
    #   control, and qk-normed scores sit ~±11 nats — far inside exp2's
    #   ±126).  A one-op in-kernel clamp at 80 log2-units makes it
    #   overflow-proof for arbitrary data: exact below the clamp, and
    #   past it the top scores flatten instead of producing inf/NaN.
    #   The training flash kernel has the same mode (backward exact via
    #   the base-e lse at scale=ln2); the int8 decode kernels fall back
    #   to 'bounded' (they need the m0 quantization bound).
    # 'bounded' replaces the online running max
    # with a per-layer score upper bound (exact softmax, ~12% faster
    # kernel on v5e — ops/pallas_attention.py); 'online' = flash-attention
    # running max (bit-matches the historical kernel).  CAVEAT: 'bounded'
    # is exact only while the bound's slack (Cauchy-Schwarz bound minus a
    # row's true max score) stays below ~87 nats — past that exp(s - m0)
    # underflows and the row's output collapses to zero WITHOUT an error.
    # With qk-norm the slack is ~scale*|w_q||w_k|*D minus typical logits
    # (~8 nats at unit norm weights; measured 1.3e-3 rel diff at 1.3B).
    # Checkpoints with unusually large qk-norm gains should flip to
    # 'online' (validate once per checkpoint: run one forward both ways).
    # The kmax cache bound is tight for the global-window pipeline (only
    # refresh-written rows that are still live contribute; the cache
    # reset zeroes it per video); windowed mode never uses it.
    attn_softmax: str = "free"
    # Megatron-style tensor parallelism over ICI (the 14B single-host
    # story; the reference has no TP — SURVEY.md §2.8 'absent').  When set,
    # the forward is being traced inside a shard_map over this mesh axis
    # with num_heads/ffn_dim already divided down to the per-device shard
    # (parallel/tensor.py builds such configs); the block code then psums
    # the row-sharded projections and the qk-norm statistics.
    tp_axis: str | None = None
    # set by parallel/tensor.tp_local_config: under TP, num_heads is the
    # LOCAL head count while dim stays the model width, so head_dim can no
    # longer be derived as dim // num_heads
    head_dim_override: int | None = None
    # Windowed-streaming KV buffer size in frames (>= local_attn_size;
    # None = local_attn_size, the reference's buffer==window sizing,
    # causal_inference.py:283-288).  A LARGER buffer amortizes eviction:
    # blocks append without any roll (the attention kernels read the live
    # content as two intervals — sink frames + recent window — via the
    # ``sink_end`` window, ops/pallas_attention.py), and only when the
    # buffer physically fills does one contiguous-copy compaction move
    # [sinks | recent] back to the front.  With the default (buffer ==
    # window) the compaction degenerates to exactly the reference's
    # per-block eviction (causal_model.py:203-229), now as a contiguous
    # dynamic-slice copy instead of a full-cache gather.
    windowed_buffer_frames: int | None = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.dim // self.num_heads

    def max_attention_size(self, frame_seqlen: int) -> int:
        """Attention window in tokens (causal_model.py:77): 21 frames when
        global, else local_attn_size frames."""
        if self.local_attn_size == -1:
            return 21 * frame_seqlen
        return self.local_attn_size * frame_seqlen

    @property
    def buffer_frames(self) -> int:
        """Windowed KV buffer size in frames (windowed mode only)."""
        assert self.local_attn_size != -1
        bf = (self.local_attn_size if self.windowed_buffer_frames is None
              else self.windowed_buffer_frames)
        assert bf >= self.local_attn_size, \
            "windowed_buffer_frames must be >= local_attn_size"
        return bf


def apply_model_kwargs(cfg: WanConfig, config) -> WanConfig:
    """Overlay the yaml config's ``model_kwargs`` architecture knobs onto
    a WanConfig — the reference passes these into WanDiffusionWrapper
    (model/base.py:38, utils/wan_wrapper.py:120-131).  Only the keys that
    are WanConfig fields here apply (timestep_shift / lora_* ride other
    config paths); this is how a yaml selects the windowed-streaming
    mode (local_attn_size / sink_size / windowed_buffer_frames)."""
    mk = getattr(config, "model_kwargs", None) or {}
    fields = {"local_attn_size", "sink_size", "windowed_buffer_frames",
              "num_frame_per_block", "independent_first_frame",
              "attn_quant", "attn_softmax"}
    over = {k: v for k, v in dict(mk).items() if k in fields}
    return dataclasses.replace(cfg, **over) if over else cfg


WAN_1_3B = WanConfig()

WAN_14B = WanConfig(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)

# 2-head, 2-layer toy geometry; head_dim 64 keeps the f/h/w rope split valid.
WAN_TINY = WanConfig(dim=128, ffn_dim=256, num_heads=2, num_layers=2,
                     text_dim=64, freq_dim=32)

# Default latent geometry for 81 frames @ 480x832
# (inference.py:161-163: noise [B, 21, 16, 60, 104]).
LATENT_FRAMES = 21
LATENT_HEIGHT = 60
LATENT_WIDTH = 104
FRAME_SEQLEN = (LATENT_HEIGHT // 2) * (LATENT_WIDTH // 2)  # 1560
SEQ_LEN = LATENT_FRAMES * FRAME_SEQLEN                     # 32760

# ---------------------------------------------------------------------
# Named registries mirroring the reference's wan/configs/__init__.py:15-41
# (WAN_CONFIGS / SIZE_CONFIGS / MAX_AREA_CONFIGS / SUPPORTED_SIZES) so
# callers of the upstream generation API (wan_generate.py) can select
# models/sizes by the same keys.
# ---------------------------------------------------------------------

WAN_I2V_14B = dataclasses.replace(WAN_14B, model_type="i2v", in_dim=36)

WAN_CONFIGS = {
    "t2v-14B": WAN_14B,
    "t2v-1.3B": WAN_1_3B,
    "i2v-14B": WAN_I2V_14B,
    "t2i-14B": WAN_14B,
}

SIZE_CONFIGS = {
    "720*1280": (720, 1280),
    "1280*720": (1280, 720),
    "480*832": (480, 832),
    "832*480": (832, 480),
    "1024*1024": (1024, 1024),
}

MAX_AREA_CONFIGS = {
    "720*1280": 720 * 1280,
    "1280*720": 1280 * 720,
    "480*832": 480 * 832,
    "832*480": 832 * 480,
}

SUPPORTED_SIZES = {
    "t2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2v-1.3B": ("480*832", "832*480"),
    "i2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2i-14B": tuple(SIZE_CONFIGS.keys()),
}
