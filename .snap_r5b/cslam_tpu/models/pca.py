"""PCA fitting/projection for NetVLAD descriptor reduction.

The reference loads a pre-fitted sklearn PCA from a pickle
(``netvlad.py:209-210``, ``netvlad_pca.pkl`` from ``models/download.sh``).
This module both (a) fits an equivalent projection on device from a sample
of raw VLAD descriptors, so a deployment can whiten on its own data without
sklearn, and (b) converts a fitted sklearn PCA into the dict
``cslam_tpu.models.netvlad.NetVLAD`` consumes.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def fit_pca(descriptors: np.ndarray, out_dim: int,
            whiten: bool = False) -> Dict[str, np.ndarray]:
    """Fit a PCA projection: ``[N, D] -> {components [out_dim, D], mean [D]}``.

    Matches sklearn semantics (components = right singular vectors of the
    centered data); runs as one jitted SVD.
    """
    x = jnp.asarray(descriptors, jnp.float32)
    mean = jnp.mean(x, axis=0)

    @jax.jit
    def _fit(x, mean):
        xc = x - mean
        _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
        return s, vt

    s, vt = _fit(x, mean)
    components = np.asarray(vt)[:out_dim]
    if whiten:
        n = descriptors.shape[0]
        scale = np.sqrt(n - 1) / np.maximum(np.asarray(s)[:out_dim], 1e-12)
        components = components * scale[:, None]
    return {"components": components.astype(np.float32),
            "mean": np.asarray(mean, np.float32)}


def from_sklearn(pca) -> Dict[str, np.ndarray]:
    """Convert a fitted ``sklearn.decomposition.PCA`` (what the reference
    pickles) into the projection dict. Folds ``whiten=True`` (sklearn's
    transform divides by sqrt(explained_variance_)) into the components so
    the jitted projection matches ``pca.transform`` exactly."""
    components = np.asarray(pca.components_, np.float32)
    if getattr(pca, "whiten", False):
        scale = np.sqrt(np.asarray(pca.explained_variance_, np.float32))
        components = components / np.maximum(scale, 1e-12)[:, None]
    return {"components": components,
            "mean": np.asarray(pca.mean_, np.float32)}
