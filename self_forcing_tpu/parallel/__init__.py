from self_forcing_tpu.parallel.mesh import (
    create_mesh,
    fsdp_shardings,
    shard_params,
    replicate,
    data_sharding,
)
from self_forcing_tpu.parallel import tensor

__all__ = ["create_mesh", "fsdp_shardings", "shard_params", "replicate",
           "data_sharding", "tensor"]
