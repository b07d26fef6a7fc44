"""NetVLAD global descriptor in JAX.

Architecture parity with the reference (``cslam/vpr/netvlad.py``): VGG16
conv trunk + NetVLAD pooling (64 clusters x 512 dims) + PCA projection +
L2 normalization. The reference's per-cluster residual Python loop
(``netvlad.py:119-124``, a ranked hot loop) collapses into two einsums:

    vlad[n,k,c] = sum_hw soft[n,k,hw] * (x[n,c,hw] - centroid[k,c])
                = einsum(soft, x) - (sum_hw soft) * centroid

``nn_checkpoint: 'disable'`` returns random 128-dim descriptors
(``netvlad.py:242-245``).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cslam_tpu.models import preprocess
from cslam_tpu.models.backbones import VGG16Features


class NetVLADLayer(nn.Module):
    """Soft-assignment VLAD pooling (reference ``netvlad.py:28-130``)."""

    num_clusters: int = 64
    dim: int = 512
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        # x: [N, H, W, C]
        N = x.shape[0]
        if self.normalize_input:
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        soft = nn.Conv(self.num_clusters, (1, 1), use_bias=False,
                       name="conv")(x)                       # [N, H, W, K]
        soft = jax.nn.softmax(soft.reshape(N, -1, self.num_clusters), axis=-1)
        centroids = self.param("centroids", nn.initializers.uniform(1.0),
                               (self.num_clusters, self.dim))
        feats = x.reshape(N, -1, self.dim)                   # [N, HW, C]
        vlad = (jnp.einsum("nhk,nhc->nkc", soft, feats)
                - jnp.sum(soft, axis=1)[..., None] * centroids[None])
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        vlad = vlad.reshape(N, -1)
        return vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)


class NetVLADNet(nn.Module):
    """``compute_dtype=bfloat16`` runs the VGG16 trunk on the MXU in bf16
    (same pattern as CosPlace's GeoLocalizationNet); the VLAD pooling,
    normalizations and PCA stay float32 so similarity ranking is stable."""

    num_clusters: int = 64
    compute_dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = VGG16Features(name="encoder")(x.astype(self.compute_dtype))
        x = x.astype(jnp.float32)
        return NetVLADLayer(self.num_clusters, 512, name="pool")(x)


import functools


@functools.partial(jax.jit, static_argnames=("model",))
def _netvlad_forward(model, variables, x, pca_components, pca_mean):
    """Shared jitted forward (VLAD + PCA + L2) keyed by the flax Module."""
    vlad = model.apply(variables, x)
    reduced = (vlad - pca_mean) @ pca_components.T
    return reduced / jnp.maximum(
        jnp.linalg.norm(reduced, axis=-1, keepdims=True), 1e-12)


class NetVLAD:
    """NetVLAD matcher with the reference's duck-typed interface."""

    RAW_DIM = 64 * 512
    DISABLED_DIM = 128  # reference returns 128-dim random when disabled

    def __init__(self, params: dict,
                 torch_state_dict: Optional[dict] = None,
                 pca: Optional[dict] = None):
        self.params = params
        self.crop = params.get("frontend.image_crop_size", 376)
        self.enable = str(params.get("frontend.nn_checkpoint",
                                     "disable")).lower() != "disable"
        self._rng = np.random.default_rng(params.get("robot_id", 0))
        if not self.enable:
            return

        dtype_name = str(params.get("frontend.compute_dtype", "float32"))
        self.compute_dtype = (jnp.bfloat16 if "bfloat16" in dtype_name
                              else jnp.float32)
        self.model = NetVLADNet(compute_dtype=self.compute_dtype)
        ckpt = params.get("frontend.nn_checkpoint", "")
        if torch_state_dict is None and ckpt and ckpt.lower() != "random":
            import torch
            payload = torch.load(ckpt, map_location="cpu")
            torch_state_dict = payload.get("state_dict", payload)
        if torch_state_dict is not None:
            from cslam_tpu.models.convert import convert_netvlad
            self.variables = convert_netvlad(torch_state_dict)
        else:
            self.variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
        if self.compute_dtype != jnp.float32:
            # bf16 trunk params (flax promotes to the widest operand dtype,
            # so the encoder runs on the MXU in bf16; pool/PCA stay f32)
            params_tree = dict(self.variables["params"])
            params_tree["encoder"] = jax.tree_util.tree_map(
                lambda a: a.astype(self.compute_dtype),
                params_tree["encoder"])
            self.variables = {**self.variables, "params": params_tree}

        # PCA projection: components [out_dim, RAW_DIM], mean [RAW_DIM]
        # (the reference unpickles a fitted sklearn PCA, ``netvlad.py:209-210``)
        pca_path = params.get("frontend.netvlad.pca_checkpoint", "")
        if pca is None and pca_path:
            import pickle

            from cslam_tpu.models.pca import from_sklearn
            with open(pca_path, "rb") as f:
                pca = from_sklearn(pickle.load(f))
        if pca is None:
            pca = {"components": np.eye(self.DISABLED_DIM, self.RAW_DIM,
                                        dtype=np.float32),
                   "mean": np.zeros(self.RAW_DIM, np.float32)}
        self._pca_components = jnp.asarray(pca["components"], jnp.float32)
        self._pca_mean = jnp.asarray(pca["mean"], jnp.float32)

        # shared jitted program per model CONFIG (see cosplace._apply_model:
        # per-instance closures can never cache-hit across robots)
        self._forward = lambda v, x: _netvlad_forward(
            self.model, v, x, self._pca_components, self._pca_mean)

    def compute_embedding(self, keyframe: np.ndarray) -> np.ndarray:
        if not self.enable:
            return self._rng.random(self.DISABLED_DIM)
        return self.compute_embeddings(keyframe[None])[0]

    def compute_embeddings(self, images: np.ndarray) -> np.ndarray:
        if not self.enable:
            return self._rng.random((images.shape[0], self.DISABLED_DIM))
        x = preprocess.preprocess(images, self.crop)
        return np.asarray(self._forward(self.variables, x))

    def compute_embedding_begin(self, keyframe: np.ndarray):
        """Dispatch one image's descriptor WITHOUT the blocking device read
        (see ``cosplace.CosPlaceModel.compute_embedding_begin``)."""
        if not self.enable:
            return self._rng.random(self.DISABLED_DIM)
        from cslam_tpu.utils import device_read
        x = preprocess.preprocess(keyframe[None], self.crop)
        out = self._forward(self.variables, x)
        device_read.prefetch((out,))
        return out

    @staticmethod
    def compute_embedding_finish(pending) -> np.ndarray:
        return np.asarray(pending)[0] if getattr(pending, "ndim", 1) == 2 \
            else np.asarray(pending)

    def forward_preprocessed(self, x: np.ndarray) -> np.ndarray:
        """Full forward (VLAD + PCA + normalize) on already-preprocessed
        NHWC input — the checkpoint-parity harness compares this against
        torch inference on identical tensors."""
        return np.asarray(self._forward(self.variables, jnp.asarray(x)))

    def compute_vlad(self, x: np.ndarray) -> np.ndarray:
        """Raw (pre-PCA) VLAD descriptors for preprocessed NHWC input."""
        from cslam_tpu.models.cosplace import _apply_model
        return np.asarray(_apply_model(self.model, self.variables,
                                       jnp.asarray(x)))
