"""Load the reference repo's CUSTOM model classes from /root/reference.

The strongest weight-fidelity evidence available in this container is
numerical parity against the reference's *patched* model code (not stock HF
classes): modeling_llama_imgemb's <IMG>-splicing LlamaForCausalLM, the
Qformer BertLMHeadModel, the biovil_t ImageModel, and ChexpertClassifier.
The reference pins torch 1.13 / transformers 4.28 and pulls in packages this
container doesn't ship (omegaconf, timm, torchvision, health_multimodal), so
this module provides:

  * sys.modules stubs for the three missing packages, faithful to the tiny
    API surface the reference files actually touch (timm's DropPath/Mlp/
    trunc_normal_, health_multimodal's get_module_device, and torchvision's
    ResNet/BasicBlock/Bottleneck — the canonical architecture the reference
    subclasses in biovil_t/resnet.py:15-60);
  * back-compat patches for transformers 4.57 (apply_chunking_to_forward &
    friends moved from modeling_utils to pytorch_utils);
  * direct-file importers for Qformer.py / modeling_llama_imgemb.py that
    bypass the lavis package __init__ chain (which imports omegaconf's
    config system the tests don't need);
  * a no-download substitute for torchvision's pretrained-weight fetch
    (biovil_t/encoder.py:45 constructs resnet50(pretrained=True) always;
    this container has zero egress).

Everything here is test scaffolding for parity measurement — none of it is
part of the radialog_tpu framework.
"""
from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name: str) -> types.ModuleType:
    """A stub module with a real ModuleSpec — transformers probes package
    availability via importlib.util.find_spec, which raises on spec-less
    modules sitting in sys.modules."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


# --------------------------------------------------------------------- stubs
def _stub_health_multimodal():
    if "health_multimodal.common.device" in sys.modules:
        return
    hm = _module("health_multimodal")
    common = _module("health_multimodal.common")
    device = _module("health_multimodal.common.device")

    def get_module_device(module):
        return next(module.parameters()).device

    device.get_module_device = get_module_device
    hm.common = common
    common.device = device
    sys.modules["health_multimodal"] = hm
    sys.modules["health_multimodal.common"] = common
    sys.modules["health_multimodal.common.device"] = device


def _stub_timm():
    if "timm.models.layers" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        """Stochastic depth (timm). Identity in eval mode — the reference
        only runs the ViT pooler at drop_path=0.25 *train* time."""

        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype,
                                                 device=x.device))
            return x.div(keep) * mask

    class Mlp(nn.Module):
        """timm MLP: fc1 -> act -> drop -> fc2 -> drop (param names fc1/fc2
        are the checkpoint contract used by convert_biovil_t)."""

        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    timm = _module("timm")
    models = _module("timm.models")
    layers = _module("timm.models.layers")
    layers.DropPath = DropPath
    layers.Mlp = Mlp
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.models = models
    models.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _stub_torchvision():
    if "torchvision.models.resnet" in sys.modules:
        return
    import torch
    import torch.nn as nn

    # Canonical torchvision ResNet (models/resnet.py) — the exact
    # architecture biovil_t/resnet.py:15-60 subclasses. Reproduced here
    # because torchvision isn't installed; structure and parameter names
    # must match so reference state dicts convert byte-for-byte.
    def conv3x3(in_planes, out_planes, stride=1, groups=1, dilation=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=3, stride=stride,
                         padding=dilation, groups=groups, bias=False,
                         dilation=dilation)

    def conv1x1(in_planes, out_planes, stride=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=1, stride=stride,
                         bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            if norm_layer is None:
                norm_layer = nn.BatchNorm2d
            if groups != 1 or base_width != 64:
                raise ValueError("BasicBlock only supports groups=1, base_width=64")
            if dilation > 1:
                raise NotImplementedError("Dilation > 1 not supported in BasicBlock")
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            if norm_layer is None:
                norm_layer = nn.BatchNorm2d
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = conv1x1(inplanes, width)
            self.bn1 = norm_layer(width)
            self.conv2 = conv3x3(width, width, stride, groups, dilation)
            self.bn2 = norm_layer(width)
            self.conv3 = conv1x1(width, planes * self.expansion)
            self.bn3 = norm_layer(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000,
                     zero_init_residual=False, groups=1, width_per_group=64,
                     replace_stride_with_dilation=None, norm_layer=None):
            super().__init__()
            if norm_layer is None:
                norm_layer = nn.BatchNorm2d
            self._norm_layer = norm_layer
            self.inplanes = 64
            self.dilation = 1
            if replace_stride_with_dilation is None:
                replace_stride_with_dilation = [False, False, False]
            if len(replace_stride_with_dilation) != 3:
                raise ValueError("replace_stride_with_dilation should be a "
                                 "3-element tuple")
            self.groups = groups
            self.base_width = width_per_group
            self.conv1 = nn.Conv2d(3, self.inplanes, kernel_size=7, stride=2,
                                   padding=3, bias=False)
            self.bn1 = norm_layer(self.inplanes)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2,
                                           dilate=replace_stride_with_dilation[0])
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2,
                                           dilate=replace_stride_with_dilation[1])
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2,
                                           dilate=replace_stride_with_dilation[2])
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)

            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                            nonlinearity="relu")
                elif isinstance(m, (nn.BatchNorm2d, nn.GroupNorm)):
                    nn.init.constant_(m.weight, 1)
                    nn.init.constant_(m.bias, 0)
            if zero_init_residual:
                for m in self.modules():
                    if isinstance(m, Bottleneck):
                        nn.init.constant_(m.bn3.weight, 0)
                    elif isinstance(m, BasicBlock):
                        nn.init.constant_(m.bn2.weight, 0)

        def _make_layer(self, block, planes, blocks, stride=1, dilate=False):
            norm_layer = self._norm_layer
            downsample = None
            previous_dilation = self.dilation
            if dilate:
                self.dilation *= stride
                stride = 1
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    conv1x1(self.inplanes, planes * block.expansion, stride),
                    norm_layer(planes * block.expansion),
                )
            layers = [block(self.inplanes, planes, stride, downsample,
                            self.groups, self.base_width, previous_dilation,
                            norm_layer)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes, groups=self.groups,
                                    base_width=self.base_width,
                                    dilation=self.dilation,
                                    norm_layer=norm_layer))
            return nn.Sequential(*layers)

        def _forward_impl(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

        def forward(self, x):
            return self._forward_impl(x)

    tv = _module("torchvision")
    tv_models = _module("torchvision.models")
    tv_resnet = _module("torchvision.models.resnet")
    tv_resnet.ResNet = ResNet
    tv_resnet.BasicBlock = BasicBlock
    tv_resnet.Bottleneck = Bottleneck
    # keys only — the fake loader below dispatches on these strings
    tv_resnet.model_urls = {"resnet18": "resnet18", "resnet50": "resnet50"}
    tv_datasets = _module("torchvision.datasets")
    tv_dutils = _module("torchvision.datasets.utils")

    def download_url(*args, **kwargs):
        raise RuntimeError("no egress in this container — parity tests must "
                           "construct models with pretrained_model_path=None")

    tv_dutils.download_url = download_url
    tv.models = tv_models
    tv_models.resnet = tv_resnet
    tv.datasets = tv_datasets
    tv_datasets.utils = tv_dutils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.resnet"] = tv_resnet
    sys.modules["torchvision.datasets"] = tv_datasets
    sys.modules["torchvision.datasets.utils"] = tv_dutils


def _patch_transformers_backcompat():
    """transformers 4.57 moved the BERT-era helpers out of modeling_utils;
    the reference's Qformer.py (pinned 4.28) imports them from there."""
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu
    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))


def _ensure_ref_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def _load_file_module(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------------------- loaders
def load_ref_qformer():
    """The reference's Qformer.py (BertLMHeadModel with cross-attention /
    query FFN / UniLM masks), imported directly from file to bypass the
    lavis package __init__ (which drags in omegaconf)."""
    _patch_transformers_backcompat()
    return _load_file_module(
        "ref_qformer",
        f"{REFERENCE_ROOT}/model/lavis/models/blip2_models/Qformer.py")


def load_ref_llama_imgemb():
    """The reference's modeling_llama_imgemb.py (<IMG>-splicing LLaMA).

    NOTE: LlamaModel.__init__ unconditionally pickle-loads
    pretraining/embs/..._test.pkl relative to the CWD
    (modeling_llama_imgemb.py:454-462) — construct models from a directory
    staged by stage_blip_embeddings().
    """
    _patch_transformers_backcompat()
    return _load_file_module(
        "ref_llama_imgemb",
        f"{REFERENCE_ROOT}/model/lavis/models/blip2_models/modeling_llama_imgemb.py")


def stage_blip_embeddings(root, embeddings: dict):
    """Create the pickled-embedding layout LlamaModel.__init__ expects under
    ``root`` (the reference's disk handoff contract, SURVEY §7 quirk 4)."""
    import pickle
    from pathlib import Path

    d = Path(root) / "pretraining" / "embs"
    d.mkdir(parents=True, exist_ok=True)
    stem = "stage1_pt_instruct_blip_origlr_img448_embeddings"
    with open(d / f"{stem}_test.pkl", "wb") as f:
        pickle.dump(embeddings, f)
    with open(d / f"{stem}_train_all.pkl", "wb") as f:
        pickle.dump({}, f)


def load_ref_biovil():
    """Import the biovil_t package with no-download pretrained weights:
    resnet50(pretrained=True) (encoder.py:45) resolves to a deterministic
    seeded state dict instead of the torchvision URL fetch."""
    import torch

    _stub_health_multimodal()
    _stub_timm()
    _stub_torchvision()
    _ensure_ref_path()

    import biovil_t.resnet as ref_resnet

    tv_resnet = sys.modules["torchvision.models.resnet"]

    def fake_load_state_dict_from_url(url, progress=True, **kwargs):
        torch.manual_seed(0)
        if url == "resnet50":
            m = ref_resnet.ResNetHIML(block=tv_resnet.Bottleneck,
                                      layers=[3, 4, 6, 3])
        else:
            m = ref_resnet.ResNetHIML(block=tv_resnet.BasicBlock,
                                      layers=[2, 2, 2, 2])
        return m.state_dict()

    ref_resnet.load_state_dict_from_url = fake_load_state_dict_from_url

    import biovil_t.model as ref_model
    import biovil_t.types as ref_types
    return ref_model, ref_types


def load_ref_chexpert():
    """findings_classifier.chexpert_model with the weight download replaced
    by an in-memory ImageModel construction (chexpert_model.py:10 calls
    get_biovil_t_image_encoder(), which fetches from HF)."""
    ref_model, ref_types = load_ref_biovil()
    import findings_classifier.chexpert_model as ref_cls

    def offline_biovil_t():
        return ref_model.ImageModel(
            img_encoder_type=ref_types.ImageEncoderType.RESNET50_MULTI_IMAGE,
            joint_feature_size=128, pretrained_model_path=None)

    ref_cls.get_biovil_t_image_encoder = offline_biovil_t
    return ref_cls
