from .partition import (llama_partition_specs, lora_partition_specs,
                        shard_params, with_sharding_constraints)
from .tp_ring import TPRingBatcher
from .tp_serving import (make_tp_generate, shard_config, shard_lora,
                         shard_quantized_llama, tp_generate)

__all__ = ["llama_partition_specs", "lora_partition_specs", "shard_params",
           "with_sharding_constraints", "TPRingBatcher", "make_tp_generate",
           "shard_config", "shard_lora", "shard_quantized_llama",
           "tp_generate"]
