"""radialog_tpu — a TPU-native (JAX/XLA/Pallas) chest X-ray report-generation framework.

Re-implements the full capability surface of ChantalMP/RaDialog (MIDL 2025) —
BioViL-T image encoding, CheXpert findings classification, BLIP-2 Q-Former
visual projection, Vicuna-7B+LoRA report generation with paged KV-cache
decoding, CheXbert clinical-correctness evaluation, interactive dialog — as a
from-scratch JAX framework designed for TPU hardware: bf16 MXU compute, static
shapes, pjit/shard_map parallelism over device meshes, and Pallas kernels for
the hot attention paths.

Package layout:
  core/      config, mesh + sharding, checkpointing, PRNG policy
  ops/       functional NN ops (norms, attention, rotary, image pipeline, Pallas kernels)
  models/    resnet, vit_pooler, biovil_t, qformer, llama (+LoRA), chexpert, chexbert
  decode/    autoregressive engine: KV cache, batched greedy/sample decode
  data/      section parser, conversation templates, tokenizers, datasets
  train/     schedules, optimizers, stage-1 (ITC/ITM/LM) + LoRA finetune steps
  eval/      BLEU/ROUGE/METEOR (no Java), CheXbert CE metrics, CSV writers
  parallel/  param partition specs, multi-chip shardings
  utils/     metric logging, json-lines run logs
"""

__version__ = "0.1.0"
