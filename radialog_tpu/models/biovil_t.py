"""BioViL-T image model: ResNet-50 trunk + multi-image fusion + MLP projector.

Re-implements biovil_t/encoder.py + model.py + modules.py as one functional
JAX model:

  image (B,448,448,3) --resnet50--> (B,14,14,2048)
    --1x1 conv (backbone_to_vit)--> (B,14,14,256) = patch_x
    prior image given?  diff = vit_pooler(patch_x, patch_prev)
    else                diff = broadcast learned missing_previous_emb
                        (encoder.py:124-128 — the only path RaDialog uses)
  patch_fused = concat([patch_x, diff], channel) -> (B,14,14,512)
  pooled      = global avg pool                  -> (B,512)
  projected_patch = MLP1x1(512 -> J -> J) with BatchNorm+ReLU (modules.py:12-54)
  projected_global = spatial mean of projected_patch (model.py:84)

joint_feature_size J = 128 for the findings classifier (pretrained.py:17) and
1408 for the BLIP/Q-Former path (blip2.py:83).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.layers import (DTypePolicy, FP32, batchnorm, batchnorm_init, conv2d,
                          conv2d_init, global_avg_pool, trunc_normal)
from .resnet import RESNET50_LAYERS, resnet_apply, resnet_init
from .vit_pooler import vit_pooler_apply, vit_pooler_init

VIT_DIM = 256          # backbone_to_vit output channels (encoder.py:97)
FUSED_DIM = 2 * VIT_DIM  # [f_static, f_diff] (encoder.py:97,130)


class ImageModelOutput(NamedTuple):
    """Mirrors biovil_t/types.py:16-22 (NHWC layouts here)."""

    img_embedding: jax.Array               # (B, 512) pooled fused features
    patch_embeddings: jax.Array            # (B, 14, 14, 512) fused patch grid
    projected_patch_embeddings: jax.Array  # (B, 14, 14, J)
    projected_global_embedding: jax.Array  # (B, J)


def biovil_t_init(key: jax.Array, joint_feature_size: int = 128,
                  resnet_layers=RESNET50_LAYERS,
                  bottleneck: bool = True) -> Tuple[Dict, Dict]:
    """Init (params, state) for the full image model.

    resnet_layers/bottleneck default to the reference's ResNet-50; tests pass
    smaller stacks (e.g. (1,1,1,1) basic blocks) to keep CPU compiles fast."""
    ks = jax.random.split(key, 5)
    params: Dict = {}
    state: Dict = {}
    params["resnet"], state["resnet"] = resnet_init(ks[0], resnet_layers, bottleneck=bottleneck)
    trunk_out = 512 * (4 if bottleneck else 1)  # 2048 for ResNet-50
    params["backbone_to_vit"] = conv2d_init(ks[1], trunk_out, VIT_DIM, 1, bias=False)
    params["vit_pooler"] = vit_pooler_init(ks[2], dim=VIT_DIM, grid=(14, 14))
    params["missing_previous_emb"] = trunc_normal(ks[3], (VIT_DIM,), std=0.02)
    # projector: conv1x1 512->J (no bias) + BN + ReLU + conv1x1 J->J (bias)
    kp1, kp2 = jax.random.split(ks[4])
    params["proj1"] = conv2d_init(kp1, FUSED_DIM, joint_feature_size, 1, bias=False)
    params["proj_bn"], state["proj_bn"] = batchnorm_init(joint_feature_size)
    params["proj2"] = conv2d_init(kp2, joint_feature_size, joint_feature_size, 1, bias=True)
    return params, state


def biovil_t_apply(params: Dict, state: Dict, current: jax.Array,
                   previous: Optional[jax.Array] = None,
                   train: bool = False, policy: DTypePolicy = FP32,
                   key=None) -> Tuple[ImageModelOutput, Dict]:
    """current/previous: (B, H, W, 3) float in [0,1]. Returns (outputs, new_state)."""
    new_state: Dict = {}
    if previous is not None:
        # single trunk pass over the concatenated batch (encoder.py:117-123)
        both = jnp.concatenate([current, previous], axis=0)
        feats, new_state["resnet"] = resnet_apply(params["resnet"], state["resnet"],
                                                  both, train, policy=policy)
        feats = conv2d(params["backbone_to_vit"], feats, 1, "SAME", policy=policy)
        b = current.shape[0]
        patch_x, patch_prev = feats[:b], feats[b:]
        diff = vit_pooler_apply(params["vit_pooler"], patch_x, patch_prev,
                                policy=policy, train=train, key=key)
    else:
        feats, new_state["resnet"] = resnet_apply(params["resnet"], state["resnet"],
                                                  current, train, policy=policy)
        patch_x = conv2d(params["backbone_to_vit"], feats, 1, "SAME", policy=policy)
        diff = jnp.broadcast_to(
            params["missing_previous_emb"].astype(patch_x.dtype), patch_x.shape)

    patch_fused = jnp.concatenate([patch_x, diff], axis=-1)      # (B,h,w,512)
    pooled = global_avg_pool(patch_fused)                        # (B,512)

    proj = conv2d(params["proj1"], patch_fused, 1, "SAME", policy=policy)
    proj, new_state["proj_bn"] = batchnorm(params["proj_bn"], state["proj_bn"], proj, train)
    proj = jax.nn.relu(proj)
    proj = conv2d(params["proj2"], proj, 1, "SAME", policy=policy)
    proj_global = proj.mean(axis=(1, 2))

    out = ImageModelOutput(
        img_embedding=pooled,
        patch_embeddings=patch_fused,
        projected_patch_embeddings=proj,
        projected_global_embedding=proj_global,
    )
    return out, new_state


def patch_tokens_for_qformer(projected_patch: jax.Array) -> jax.Array:
    """(B, h, w, J) -> (B, h*w, J) with the reference's channel-major reshape.

    CRITICAL weight-compat quirk (SURVEY §7 #1, blip2_qformer.py:96): the
    reference reshapes the torch NCHW tensor (B,1408,14,14) directly to
    (B,196,1408), scrambling channels across positions. The released Q-Former
    weights expect exactly that layout, so we transpose NHWC->NCHW first and
    reshape identically.
    """
    b, h, w, c = projected_patch.shape
    return projected_patch.transpose(0, 3, 1, 2).reshape(b, h * w, c)
