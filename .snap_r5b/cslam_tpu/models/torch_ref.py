"""Plain-torch replicas of the reference VPR models + checkpoint parity
checkers.

The reference's accuracy rests on downloaded torch checkpoints
(``/root/reference/cslam/vpr/netvlad.py:187-199``, ``cosplace.py:60-70``,
``models/download.sh``). This module provides:

- torch modules mirroring the reference/torchvision layer layout exactly
  (state_dict key-compatible), usable both as differential-test oracles
  (random weights) and as the torch side of a REAL-checkpoint parity run;
- :func:`check_cosplace_parity` / :func:`check_netvlad_parity`, which take
  a ``.pth`` path, run torch inference and the converted JAX inference on
  the same inputs, and report descriptor cosine parity — including the
  reference's sklearn-PCA + L2-normalize postprocessing for NetVLAD
  (``netvlad.py:209-237``).

Torch is an optional dependency of the *validation* plane only; the
runtime inference path is pure JAX.

Run from the CLI via ``tools/vpr_checkpoint_parity.py``.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import torch
import torch.nn as tnn
import torch.nn.functional as F


class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TBottleneck(tnn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3 conv2)."""

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


_BOTTLENECK_BLOCKS = {"resnet50": (3, 4, 6, 3),
                      "resnet101": (3, 4, 23, 3),
                      "resnet152": (3, 8, 36, 3)}


def torch_bottleneck_trunk(variant: str = "resnet50") -> tnn.Sequential:
    """torchvision resnet50/101/152 feature trunk (children()[:-2])."""
    def stage(cin, width, n, stride):
        blocks = [TBottleneck(cin, width, stride)]
        blocks += [TBottleneck(width * 4, width) for _ in range(n - 1)]
        return tnn.Sequential(*blocks)

    n1, n2, n3, n4 = _BOTTLENECK_BLOCKS[variant]
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 7, 2, 3, bias=False),
        tnn.BatchNorm2d(64),
        tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2, 1),
        stage(64, 64, n1, 1),
        stage(256, 128, n2, 2),
        stage(512, 256, n3, 2),
        stage(1024, 512, n4, 2),
    )


def torch_resnet50_trunk() -> tnn.Sequential:
    """torchvision resnet50 feature trunk (children()[:-2]) layout."""
    return torch_bottleneck_trunk("resnet50")


def torch_resnet18_trunk() -> tnn.Sequential:
    """torchvision resnet18 feature trunk (children()[:-2]) layout."""
    layers = [
        tnn.Conv2d(3, 64, 7, 2, 3, bias=False),
        tnn.BatchNorm2d(64),
        tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, 2, 1),
        tnn.Sequential(TBasicBlock(64, 64), TBasicBlock(64, 64)),
        tnn.Sequential(TBasicBlock(64, 128, 2), TBasicBlock(128, 128)),
        tnn.Sequential(TBasicBlock(128, 256, 2), TBasicBlock(256, 256)),
        tnn.Sequential(TBasicBlock(256, 512, 2), TBasicBlock(512, 512)),
    ]
    return tnn.Sequential(*layers)


def torch_vgg16_trunk() -> tnn.Sequential:
    """torchvision vgg16.features[:-2] layout (drop last ReLU+pool)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers, cin = [], 3
    for item in cfg:
        if item == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(cin, item, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            cin = item
    return tnn.Sequential(*layers[:-1])


class TGeM(tnn.Module):
    def __init__(self, p=3.0):
        super().__init__()
        self.p = tnn.Parameter(torch.ones(1) * p)

    def forward(self, x):
        return F.avg_pool2d(x.clamp(min=1e-6).pow(self.p),
                            (x.size(-2), x.size(-1))).pow(1.0 / self.p)


class TCosPlace(tnn.Module):
    """CosPlace GeoLocalizationNet replica (reference
    cosplace_utils/network.py:19-35); any reference backbone name."""

    _TRUNKS = {"resnet18": (torch_resnet18_trunk, 512),
               "resnet50": (torch_resnet50_trunk, 2048),
               "resnet101": (lambda: torch_bottleneck_trunk("resnet101"),
                             2048),
               "resnet152": (lambda: torch_bottleneck_trunk("resnet152"),
                             2048),
               "vgg16": (torch_vgg16_trunk, 512)}

    def __init__(self, dim=64, backbone="resnet18"):
        super().__init__()
        trunk, features_dim = self._TRUNKS[backbone]
        self.backbone = trunk()
        # aggregation: 0 L2Norm, 1 GeM, 2 Flatten, 3 Linear, 4 L2Norm
        self.aggregation = tnn.ModuleDict()
        self.gem = TGeM()
        self.fc = tnn.Linear(features_dim, dim)

    def state_dict_reference_layout(self) -> Dict[str, torch.Tensor]:
        sd = {}
        for k, v in self.backbone.state_dict().items():
            sd[f"backbone.{k}"] = v
        sd["aggregation.1.p"] = self.gem.p.data
        sd["aggregation.3.weight"] = self.fc.weight.data
        sd["aggregation.3.bias"] = self.fc.bias.data
        return sd

    def load_reference_layout(self, sd: Dict[str, torch.Tensor]) -> None:
        backbone_sd = {k[len("backbone."):]: v for k, v in sd.items()
                       if k.startswith("backbone.")}
        self.backbone.load_state_dict(backbone_sd)
        self.gem.p.data = torch.as_tensor(sd["aggregation.1.p"]).reshape(1)
        self.fc.weight.data = torch.as_tensor(sd["aggregation.3.weight"])
        self.fc.bias.data = torch.as_tensor(sd["aggregation.3.bias"])

    def forward(self, x):
        x = self.backbone(x)
        x = F.normalize(x, p=2, dim=1)
        x = self.gem(x)
        x = x[:, :, 0, 0]
        x = self.fc(x)
        return F.normalize(x, p=2, dim=1)


class TNetVLADLayer(tnn.Module):
    """NetVLAD pooling torch oracle, state_dict-compatible with the
    reference layout (netvlad.py:94-130) but computed as one batched
    matmul: vlad[n,k,:] = sum_p a[n,k,p] * (x[n,:,p] - centroid[k]), which
    distributes to  a @ x^T - (sum_p a) * centroid  — no per-cluster loop.
    """

    def __init__(self, K=64, C=512):
        super().__init__()
        self.conv = tnn.Conv2d(C, K, 1, bias=False)
        self.centroids = tnn.Parameter(torch.rand(K, C))
        self.K, self.C = K, C

    def forward(self, x):
        N, C = x.shape[:2]
        x = F.normalize(x, p=2, dim=1)
        soft = F.softmax(self.conv(x).view(N, self.K, -1), dim=1)  # [N,K,P]
        xf = x.view(N, C, -1)                                      # [N,C,P]
        vlad = (torch.bmm(soft, xf.transpose(1, 2))
                - soft.sum(dim=2, keepdim=True) * self.centroids[None])
        vlad = F.normalize(vlad, p=2, dim=2).view(N, -1)
        return F.normalize(vlad, p=2, dim=1)


class TNetVLAD(tnn.Module):
    """Full reference NetVLAD model layout: modules 'encoder' (VGG16
    trunk) + 'pool' (VLAD layer) — netvlad.py:162-177."""

    def __init__(self, K=64, C=512):
        super().__init__()
        self.encoder = torch_vgg16_trunk()
        self.pool = TNetVLADLayer(K, C)

    def forward(self, x):
        return self.pool(self.encoder(x))


def _strip(sd: Dict) -> Dict:
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        out[k] = v
    return out


def check_cosplace_parity(checkpoint_path: str, fc_output_dim: int = 64,
                          images: Optional[np.ndarray] = None,
                          batch: int = 2, size: int = 224) -> Dict:
    """Load a reference CosPlace ``.pth``, run torch + converted-JAX
    inference on the same images, return parity metrics."""
    import jax.numpy as jnp

    from cslam_tpu.models.convert import convert_cosplace
    from cslam_tpu.models.cosplace import GeoLocalizationNet

    payload = torch.load(checkpoint_path, map_location="cpu",
                         weights_only=False)
    sd = _strip(payload.get("state_dict", payload)
                if isinstance(payload, dict) else payload)
    tmodel = TCosPlace(dim=fc_output_dim).eval()
    tmodel.load_reference_layout(sd)

    if images is None:
        rng = np.random.default_rng(0)
        images = rng.standard_normal((batch, size, size, 3)).astype(
            np.float32)
    x_t = torch.from_numpy(images.transpose(0, 3, 1, 2))
    with torch.no_grad():
        d_torch = tmodel(x_t).numpy()

    variables = convert_cosplace(sd, backbone="resnet18",
                                 fc_output_dim=fc_output_dim)
    d_jax = np.asarray(GeoLocalizationNet(
        backbone="resnet18", fc_output_dim=fc_output_dim).apply(
        variables, jnp.asarray(images)))
    cos = np.sum(d_torch * d_jax, axis=1) / (
        np.linalg.norm(d_torch, axis=1) * np.linalg.norm(d_jax, axis=1))
    return {"min_cosine": float(cos.min()),
            "max_abs_diff": float(np.max(np.abs(d_torch - d_jax))),
            "descriptor_dim": d_jax.shape[1]}


def check_netvlad_parity(checkpoint_path: str,
                         pca_path: Optional[str] = None,
                         images: Optional[np.ndarray] = None,
                         batch: int = 2, size: int = 224) -> Dict:
    """Load a reference NetVLAD ``.pth`` (payload dict with 'state_dict',
    netvlad.py:190-194) + the sklearn PCA pickle (netvlad.py:209-210), run
    the full reference postprocessing (pca.transform + L2 normalize) in
    torch/sklearn and the converted JAX path, return parity metrics."""
    from cslam_tpu.models.netvlad import NetVLAD

    payload = torch.load(checkpoint_path, map_location="cpu",
                         weights_only=False)
    sd = _strip(payload.get("state_dict", payload)
                if isinstance(payload, dict) else payload)
    tmodel = TNetVLAD().eval()
    tmodel.load_state_dict(sd)

    if images is None:
        rng = np.random.default_rng(0)
        images = rng.standard_normal((batch, size, size, 3)).astype(
            np.float32)
    x_t = torch.from_numpy(images.transpose(0, 3, 1, 2))
    with torch.no_grad():
        vlad_torch = tmodel(x_t).numpy()
    if pca_path:
        import pickle

        import sklearn.preprocessing
        with open(pca_path, "rb") as f:
            sk_pca = pickle.load(f)
        d_torch = sklearn.preprocessing.normalize(
            sk_pca.transform(vlad_torch))
    else:
        d_torch = vlad_torch

    params = {"frontend.nn_checkpoint": checkpoint_path,
              "frontend.netvlad.pca_checkpoint": pca_path or "",
              "frontend.compute_dtype": "float32"}
    model = NetVLAD(params)
    if pca_path:
        d_jax = model.forward_preprocessed(images)
    else:
        # without a PCA the product path projects to the disabled-dim
        # identity slice; compare in the raw VLAD space instead
        d_jax = model.compute_vlad(images)

    cos = np.sum(d_torch * d_jax, axis=1) / (
        np.linalg.norm(d_torch, axis=1) * np.linalg.norm(d_jax, axis=1))
    return {"min_cosine": float(cos.min()),
            "max_abs_diff": float(np.max(np.abs(d_torch - d_jax))),
            "descriptor_dim": d_jax.shape[1]}
