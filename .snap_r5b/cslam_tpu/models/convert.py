"""Torch-checkpoint -> flax-parameter conversion for the VPR models.

The reference ships torch state_dicts (``models/download.sh``: CosPlace
``resnet18_64.pth`` = a GeoLocalizationNet state_dict, NetVLAD
``netvlad.pth.tar`` = {'state_dict': ...}). These converters map the
torchvision-style key layout onto the flax module trees in
``cslam_tpu.models.backbones`` / ``cosplace`` / ``netvlad``.

Layout transforms: conv OIHW -> HWIO, linear [out,in] -> [in,out],
BatchNorm (weight,bias,running_mean,running_var) -> (scale,bias,mean,var).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from cslam_tpu.models.backbones import _RESNET_LAYERS, _VGG16_PLAN


def _np(t):
    """torch tensor (or array) -> numpy float32."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv(t):
    return _np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _bn(sd: Dict, prefix: str) -> Dict:
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"]),
            "mean": _np(sd[prefix + ".running_mean"]),
            "var": _np(sd[prefix + ".running_var"])}


def strip_prefix(sd: Dict, prefix: str = "module.") -> Dict:
    """Remove DataParallel wrapping prefixes (reference ``netvlad.py:182-185``)."""
    return {(k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in sd.items()}


def convert_resnet_trunk(sd: Dict, variant: str, prefix: str) -> Dict:
    """torchvision ResNet trunk (as an nn.Sequential: 0=conv1, 1=bn1,
    4..7=layer1..4, like CosPlace builds it at ``network.py:55,64``)."""
    blocks, bottleneck = _RESNET_LAYERS[variant]
    out: Dict = {
        "conv1": {"kernel": _conv(sd[f"{prefix}0.weight"])},
        "bn1": _bn(sd, f"{prefix}1"),
    }
    convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
    bns = ("bn1", "bn2", "bn3") if bottleneck else ("bn1", "bn2")
    for stage, n_blocks in enumerate(blocks):
        seq = stage + 4  # Sequential index of layer{stage+1}
        for b in range(n_blocks):
            bp = f"{prefix}{seq}.{b}."
            blk: Dict = {}
            for c, bn in zip(convs, bns):
                blk[c] = {"kernel": _conv(sd[bp + c + ".weight"])}
                blk[bn] = _bn(sd, bp + bn)
            if bp + "downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _conv(sd[bp + "downsample.0.weight"])}
                blk["downsample_bn"] = _bn(sd, bp + "downsample.1")
            out[f"layer{stage + 1}_{b}"] = blk
    return out


def convert_vgg16_trunk(sd: Dict, prefix: str) -> Dict:
    """torchvision vgg16.features[:-2] as an nn.Sequential."""
    out: Dict = {}
    conv_idx = 0
    seq_idx = 0
    for item in _VGG16_PLAN:
        if item == "M":
            seq_idx += 1  # pool layer slot
            continue
        out[f"conv{conv_idx}"] = {
            "kernel": _conv(sd[f"{prefix}{seq_idx}.weight"]),
            "bias": _np(sd[f"{prefix}{seq_idx}.bias"]),
        }
        conv_idx += 1
        seq_idx += 2  # conv + relu slots
    return out


def convert_cosplace(sd: Dict, backbone: str = "resnet18",
                     fc_output_dim: int = 64) -> Dict:
    """GeoLocalizationNet state_dict -> flax variables
    (reference model structure at ``network.py:19-35``)."""
    sd = strip_prefix(sd)
    if backbone.startswith("resnet"):
        trunk = convert_resnet_trunk(sd, backbone, "backbone.")
        trunk_name = "ResNetFeatures_0"
    else:
        trunk = convert_vgg16_trunk(sd, "backbone.")
        trunk_name = "VGG16Features_0"
    params = {
        trunk_name: trunk,
        "gem_p": _np(sd["aggregation.1.p"]).reshape(1),
        "fc": {"kernel": _np(sd["aggregation.3.weight"]).T,
               "bias": _np(sd["aggregation.3.bias"])},
    }
    return {"params": params}


def convert_netvlad(sd: Dict) -> Dict:
    """Reference NetVLAD model state_dict (modules 'encoder' + 'pool',
    ``netvlad.py:171-177``) -> flax variables."""
    sd = strip_prefix(sd)
    sd = {k.replace("encoder.module.", "encoder.")
           .replace("pool.module.", "pool."): v for k, v in sd.items()}
    params = {
        "encoder": convert_vgg16_trunk(sd, "encoder."),
        "pool": {
            "conv": {"kernel": _conv(sd["pool.conv.weight"])},
            "centroids": _np(sd["pool.centroids"]),
        },
    }
    return {"params": params}
