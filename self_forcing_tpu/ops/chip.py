"""Chip-aware kernel variant selection.

The reference dispatches attention by GPU generation (FA3 on Hopper,
FA2 elsewhere — wan/modules/attention.py:4-20).  The TPU analog: one
registry keyed by ``jax.devices()[0].device_kind`` choosing the
attention/matmul variants whose measured tradeoffs depend on the chip's
unit ratios (PERF.md "chip generations"):

- v5e (measured): bf16 'free' softmax parity kernel; the DEMO config's
  attention is int8-QK/bf16-PV ('int8qk') — the FULL-int8 kernels
  ('int8', int8 PV too) are VPU-bound there and do not pay
  (PERF.md round-1/2 A/Bs: int8-online 8.29 vs bf16-bounded 7.01
  ms/call), while int8qk halves only the QK MXU floor and wins
  (5.92 ms/call).
- v6e (projected, not measured here): doubles the int8:VPU ratio
  (1836 int8 TOP/s peak vs v5e's 394 at similar VPU width), so the
  full-int8 demo attention ('int8', tile-bounded) is expected to beat
  int8qk — its per-score-element dequant/round chain stops being the
  wall.  The linears flip to fp8 e4m3 (ops/quant.py 'fp8' mode,
  v6e-new MXU dtype): same ~2x-over-bf16 peak as int8 but with an f32
  accumulator straight out of the dot — no int32-epilogue Pallas
  kernel needed, and no int round/clamp error term.

``chip_defaults()`` only picks DEFAULTS — every knob stays explicitly
overridable (WanConfig.attn_quant / attn_softmax, the demo server's
per-request toggles, ``set_chip_override`` for tests/benchmarks).
"""
from __future__ import annotations

from typing import Optional

_OVERRIDE: Optional[str] = None

# device_kind (prefix-matched, first hit wins) -> kernel defaults
REGISTRY: dict[str, dict] = {
    # v5e: all entries measured on real hardware (PERF.md)
    "TPU v5 lite": {
        "attn_softmax": "free",       # parity decode softmax
        "demo_attn_quant": "int8qk",  # demo-config attention
        "matmul_quant": "w8a8",       # demo-config linears
    },
    # v5p: same bf16:int8 structure as v5e (459 bf16 / 918 int8) —
    # int8qk still the demo pick
    "TPU v5": {
        "attn_softmax": "free",
        "demo_attn_quant": "int8qk",
        "matmul_quant": "w8a8",
    },
    # v6e: 2x int8:VPU ratio — full-int8 attention expected to win; fp8
    # MXU is new on v6e — the linears take the no-custom-kernel e4m3
    # path (unverified projections; flip back via config if worse)
    "TPU v6": {
        "attn_softmax": "free",
        "demo_attn_quant": "int8",
        "matmul_quant": "fp8",
    },
}

_FALLBACK = {
    "attn_softmax": "free",
    "demo_attn_quant": "int8qk",
    "matmul_quant": "w8a8",
}


def set_chip_override(kind: Optional[str]) -> None:
    """Force a device kind for selection (tests / A-B benchmarks)."""
    global _OVERRIDE
    _OVERRIDE = kind


def device_kind() -> str:
    if _OVERRIDE is not None:
        return _OVERRIDE
    try:
        return jax_device_kind()
    except Exception:
        return "cpu"


def jax_device_kind() -> str:
    import jax
    return jax.devices()[0].device_kind


def chip_defaults(kind: Optional[str] = None) -> dict:
    """Kernel-variant defaults for the (detected) chip generation."""
    kind = device_kind() if kind is None else kind
    for prefix, entry in REGISTRY.items():
        if kind.startswith(prefix):
            return dict(entry)
    return dict(_FALLBACK)
