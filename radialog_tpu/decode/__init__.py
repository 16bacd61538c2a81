from .engine import DecodeParams, GenerationResult, generate, prefill, decode_loop
from .kvcache import install_prefill, bucket_length
