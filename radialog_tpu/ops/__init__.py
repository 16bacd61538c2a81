from .layers import (
    linear, linear_init,
    conv2d, conv2d_init,
    batchnorm, batchnorm_init,
    layernorm, layernorm_init,
    rmsnorm,
    embedding_lookup,
    gelu_exact, dropout,
    max_pool2d, avg_pool2d, global_avg_pool,
    trunc_normal, DTypePolicy,
)
from .attention import mha, causal_mask_bias, padding_mask_bias
from .rotary import rope_tables, apply_rope
