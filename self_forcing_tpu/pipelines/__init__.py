from self_forcing_tpu.pipelines.causal_inference import CausalInferencePipeline
from self_forcing_tpu.pipelines.bidirectional_inference import (
    BidirectionalInferencePipeline,
)

__all__ = ["CausalInferencePipeline", "BidirectionalInferencePipeline"]
