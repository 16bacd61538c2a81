from .llama import (KVCache, LlamaConfig, TINY_LLAMA, VICUNA_7B, init_cache,
                    llama_apply, llama_init, lora_init)
from .bert import BertConfig, TINY_BERT, bert_apply, bert_init
from .qformer import QFormerConfig, TINY_QFORMER, qformer_image_grounded, qformer_init
from .blip2 import (Blip2Config, blip2_encode_image, blip2_forward_image,
                    blip2_init, blip2_stage1_losses)
from .biovil_t import biovil_t_apply, biovil_t_init, patch_tokens_for_qformer
from .resnet import resnet_apply, resnet_init
from .vit_pooler import vit_pooler_apply, vit_pooler_init
from .chexpert import (CHEXPERT_CLASSES, chexpert_classifier_apply,
                       chexpert_classifier_init, predicted_findings)
from .chexbert import chexbert_apply, chexbert_init, logits_to_labels
