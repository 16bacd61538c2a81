from .layers import (
    linear, linear_init,
    conv2d, conv2d_init,
    batchnorm, batchnorm_init,
    layernorm, layernorm_init,
    rmsnorm,
    embedding_lookup,
    gelu_exact, dropout,
    max_pool2d, avg_pool2d, global_avg_pool,
    trunc_normal, DTypePolicy, FP32, BF16,
)
from .attention import mha, causal_mask_bias, padding_mask_bias, combine_bias
from .rotary import rope_tables, apply_rope
from .flash_attention import flash_attention
from .quant import (linear_q8, quantize_llama, quantize_llama_host,
                    quantize_weight)
from .q8_matmul import PackedQ8, pack_q8, q8_matmul_packed
from .q4_matmul import PackedQ4, pack_q4, q4_matmul_packed
from .image import (load_image_grayscale, preprocess_cxr, preprocess_cxr_batch,
                    preprocess_cxr_np, remap_to_uint8_np)
from .augment import (augment_cxr, augment_cxr_batch, color_jitter,
                      random_affine)
