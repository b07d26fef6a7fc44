"""VPR model tests: differential checks of the flax architectures + torch
state_dict converters against plain-torch replicas of the reference models
(torchvision-style module layout, random weights), plus disable-mode behavior.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cslam_tpu.models import make_global_descriptor
from cslam_tpu.models.backbones import ResNetFeatures, VGG16Features
from cslam_tpu.models.convert import (convert_cosplace, convert_netvlad,
                                      convert_resnet_trunk,
                                      convert_vgg16_trunk)
from cslam_tpu.models.cosplace import CosPlace, GeoLocalizationNet
from cslam_tpu.models.netvlad import NetVLADLayer, NetVLADNet

torch.manual_seed(0)


# --- plain-torch replicas with torchvision naming (weights are random; we
#     only need structural + numeric parity, not pretrained accuracy) ---

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


def torch_resnet18_trunk():
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


def torch_vgg16_trunk():
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
    return tnn.Sequential(*layers[:-1])  # drop last ReLU (features[:-2])


class TGeM(tnn.Module):
    def __init__(self, p=3.0):
        super().__init__()
        self.p = tnn.Parameter(torch.ones(1) * p)

    def forward(self, x):
        return F.avg_pool2d(x.clamp(min=1e-6).pow(self.p),
                            (x.size(-2), x.size(-1))).pow(1.0 / self.p)


class TCosPlace(tnn.Module):
    def __init__(self, dim=64):
        super().__init__()
        self.backbone = torch_resnet18_trunk()
        # aggregation: 0 L2Norm, 1 GeM, 2 Flatten, 3 Linear, 4 L2Norm
        self.aggregation = tnn.ModuleDict()
        self.gem = TGeM()
        self.fc = tnn.Linear(512, dim)

    def state_dict_reference_layout(self):
        sd = {}
        for k, v in self.backbone.state_dict().items():
            sd[f"backbone.{k}"] = v
        sd["aggregation.1.p"] = self.gem.p.data
        sd["aggregation.3.weight"] = self.fc.weight.data
        sd["aggregation.3.bias"] = self.fc.bias.data
        return sd

    def forward(self, x):
        x = self.backbone(x)
        x = F.normalize(x, p=2, dim=1)
        x = self.gem(x)
        x = x[:, :, 0, 0]
        x = self.fc(x)
        return F.normalize(x, p=2, dim=1)


class TNetVLADLayer(tnn.Module):
    def __init__(self, K=8, C=16):
        super().__init__()
        self.conv = tnn.Conv2d(C, K, 1, bias=False)
        self.centroids = tnn.Parameter(torch.rand(K, C))
        self.K, self.C = K, C

    def forward(self, x):
        N, C = x.shape[:2]
        x = F.normalize(x, p=2, dim=1)
        soft = F.softmax(self.conv(x).view(N, self.K, -1), dim=1)
        xf = x.view(N, C, -1)
        vlad = torch.zeros(N, self.K, C)
        for k in range(self.K):  # the reference's per-cluster loop
            residual = xf.unsqueeze(0).permute(1, 0, 2, 3) - \
                self.centroids[k:k + 1].expand(xf.size(-1), -1, -1) \
                    .permute(1, 2, 0).unsqueeze(0)
            residual = residual * soft[:, k:k + 1, :].unsqueeze(2)
            vlad[:, k:k + 1, :] = residual.sum(dim=-1)
        vlad = F.normalize(vlad, p=2, dim=2).view(N, -1)
        return F.normalize(vlad, p=2, dim=1)


def to_jax_nhwc(x_torch):
    return jnp.asarray(x_torch.numpy().transpose(0, 2, 3, 1))


class TestBackboneParity:

    def test_resnet18_trunk_matches_torch(self):
        tmodel = torch_resnet18_trunk().eval()
        # randomize BN stats so the test is not identity-trivial
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.5)
        x = torch.randn(2, 3, 64, 64)
        with torch.no_grad():
            y_t = tmodel(x).numpy().transpose(0, 2, 3, 1)

        sd = {f"backbone.{k}": v for k, v in tmodel.state_dict().items()}
        params = convert_resnet_trunk(sd, "resnet18", "backbone.")
        y_j = ResNetFeatures(variant="resnet18").apply(
            {"params": params}, to_jax_nhwc(x))
        np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-4)

    def test_vgg16_trunk_matches_torch(self):
        tmodel = torch_vgg16_trunk().eval()
        x = torch.randn(1, 3, 64, 64)
        with torch.no_grad():
            y_t = tmodel(x).numpy().transpose(0, 2, 3, 1)
        sd = {f"encoder.{k}": v for k, v in tmodel.state_dict().items()}
        params = convert_vgg16_trunk(sd, "encoder.")
        y_j = VGG16Features().apply({"params": params}, to_jax_nhwc(x))
        np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-3)


class TestCosPlaceParity:

    def test_full_model_matches_torch(self):
        tmodel = TCosPlace(dim=32).eval()
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.5)
        x = torch.randn(2, 3, 64, 64)
        with torch.no_grad():
            y_t = tmodel(x).numpy()
        variables = convert_cosplace(tmodel.state_dict_reference_layout(),
                                     backbone="resnet18", fc_output_dim=32)
        y_j = GeoLocalizationNet(backbone="resnet18", fc_output_dim=32).apply(
            variables, to_jax_nhwc(x))
        np.testing.assert_allclose(np.asarray(y_j), y_t, atol=5e-4)
        # descriptors are unit-norm
        np.testing.assert_allclose(np.linalg.norm(np.asarray(y_j), axis=1),
                                   1.0, atol=1e-5)


class TestNetVLADParity:

    def test_vlad_pooling_matches_reference_loop(self):
        K, C = 8, 16
        tlayer = TNetVLADLayer(K, C).eval()
        x = torch.randn(2, C, 5, 7)
        with torch.no_grad():
            y_t = tlayer(x).numpy()
        params = {"conv": {"kernel": tlayer.conv.weight.detach().numpy()
                           .transpose(2, 3, 1, 0)},
                  "centroids": tlayer.centroids.detach().numpy()}
        y_j = NetVLADLayer(num_clusters=K, dim=C).apply(
            {"params": params}, to_jax_nhwc(x))
        np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-5)


class TestDisableMode:

    @pytest.mark.parametrize("technique,dim", [("cosplace", 64),
                                               ("netvlad", 128)])
    def test_disabled_returns_random_descriptor(self, technique, dim):
        params = {"frontend.global_descriptor_technique": technique,
                  "frontend.nn_checkpoint": "disable",
                  "frontend.cosplace.descriptor_dim": 64,
                  "robot_id": 0}
        model = make_global_descriptor(params)
        d = model.compute_embedding(np.zeros((100, 100, 3), np.uint8))
        assert d.shape == (dim,)
        d2 = model.compute_embedding(np.zeros((100, 100, 3), np.uint8))
        assert not np.allclose(d, d2)  # random each call

    def test_scancontext_technique(self):
        params = {"frontend.global_descriptor_technique": "scancontext"}
        model = make_global_descriptor(params)
        pts = np.random.default_rng(0).uniform(-50, 50, (200, 3))
        d = model.compute_embedding(pts)
        assert d.shape == (1200,)


class TestRandomWeightInference:

    def test_cosplace_random_init_end_to_end(self):
        """'random' checkpoint mode: full jitted inference on a real image
        shape without any torch checkpoint."""
        params = {"frontend.nn_checkpoint": "random",
                  "frontend.cosplace.descriptor_dim": 16,
                  "frontend.cosplace.backbone": "resnet18",
                  "frontend.image_crop_size": 376,
                  "robot_id": 0}
        model = CosPlace(params)
        imgs = np.random.default_rng(1).integers(
            0, 255, (2, 376, 500, 3), dtype=np.uint8)
        d = model.compute_embeddings(imgs)
        assert d.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
        # deterministic for identical input
        np.testing.assert_allclose(model.compute_embeddings(imgs), d,
                                   atol=1e-6)


class TestMixedPrecision:

    def test_bf16_trunk_descriptors_close_to_f32(self):
        imgs = np.random.default_rng(3).integers(
            0, 255, (2, 376, 400, 3), dtype=np.uint8)
        descs = {}
        for dtype in ("float32", "bfloat16"):
            model = CosPlace({"frontend.nn_checkpoint": "random",
                              "frontend.cosplace.descriptor_dim": 32,
                              "frontend.cosplace.backbone": "resnet18",
                              "frontend.image_crop_size": 376,
                              "frontend.compute_dtype": dtype,
                              "robot_id": 0})
            descs[dtype] = model.compute_embeddings(imgs)
        cos = np.sum(descs["float32"] * descs["bfloat16"], axis=1)
        assert np.all(cos > 0.98), cos  # same place-recognition ranking

    def test_netvlad_bf16_trunk_close_to_f32(self):
        from cslam_tpu.models.netvlad import NetVLAD
        imgs = np.random.default_rng(5).integers(
            0, 255, (2, 280, 340, 3), dtype=np.uint8)
        descs = {}
        for dtype in ("float32", "bfloat16"):
            model = NetVLAD({"frontend.nn_checkpoint": "random",
                             "frontend.image_crop_size": 224,
                             "frontend.compute_dtype": dtype,
                             "robot_id": 0})
            descs[dtype] = model.compute_embeddings(imgs)
        cos = np.sum(descs["float32"] * descs["bfloat16"], axis=1)
        assert np.all(cos > 0.98), cos


class TestPCA:

    def test_fit_matches_sklearn(self):
        from sklearn.decomposition import PCA as SkPCA
        from cslam_tpu.models.pca import fit_pca, from_sklearn
        rng = np.random.default_rng(4)
        data = rng.standard_normal((200, 32)).astype(np.float32)
        data[:, :4] *= 10  # dominant directions
        ours = fit_pca(data, out_dim=8)
        sk = SkPCA(n_components=8).fit(data)
        theirs = from_sklearn(sk)
        np.testing.assert_allclose(ours["mean"], theirs["mean"], atol=1e-4)
        # components match up to sign
        for i in range(8):
            dot = abs(float(ours["components"][i] @ theirs["components"][i]))
            norm = (np.linalg.norm(ours["components"][i])
                    * np.linalg.norm(theirs["components"][i]))
            assert dot / norm > 0.999

    def test_netvlad_accepts_fitted_pca(self):
        from cslam_tpu.models.netvlad import NetVLAD
        from cslam_tpu.models.pca import fit_pca
        rng = np.random.default_rng(5)
        sample = rng.standard_normal((64, NetVLAD.RAW_DIM)).astype(np.float32)
        pca = fit_pca(sample, out_dim=16)
        model = NetVLAD({"frontend.nn_checkpoint": "random",
                         "frontend.image_crop_size": 128, "robot_id": 0},
                        pca=pca)
        d = model.compute_embedding(
            rng.integers(0, 255, (128, 128, 3)).astype(np.uint8))
        assert d.shape == (16,)
        assert np.linalg.norm(d) == pytest.approx(1.0, abs=1e-4)
