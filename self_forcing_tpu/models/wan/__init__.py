from self_forcing_tpu.models.wan.configs import WanConfig, WAN_1_3B, WAN_14B, WAN_TINY
from self_forcing_tpu.models.wan import dit, rope

__all__ = ["WanConfig", "WAN_1_3B", "WAN_14B", "WAN_TINY", "dit", "rope"]
