from .partition import (llama_partition_specs, lora_partition_specs,
                        shard_params, with_sharding_constraints)

__all__ = ["llama_partition_specs", "lora_partition_specs", "shard_params",
           "with_sharding_constraints"]
