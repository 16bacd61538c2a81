from .engine import (DecodeParams, GenerationResult, decode_loop, generate,
                     generate_jit, prefill)
from .kvcache import bucket_length, install_prefill
from .beam import beam_decode, generate_beam
from .session import InteractiveSession
from .continuous import ContinuousBatcher, RingBatcher, Session
from .speculative import (SpecResult, generate_spec, generate_spec_jit,
                          ngram_propose, spec_decode_loop)
