"""Global-descriptor (visual/lidar place recognition) models in JAX.

Factory mirrors the reference's technique selection
(``cslam/global_descriptor_loop_closure_detection.py:42-60``).
"""
from __future__ import annotations


def make_global_descriptor(params: dict):
    """Instantiate the configured global-descriptor model.

    Returns an object with ``compute_embedding(keyframe) -> np.ndarray`` —
    the duck-typed interface shared by all techniques (reference
    ``netvlad.py:212``, ``cosplace.py:81``, ``scancontext.py:14``).
    """
    technique = params.get("frontend.global_descriptor_technique",
                           "cosplace").lower()
    if technique == "netvlad":
        from cslam_tpu.models.netvlad import NetVLAD
        return NetVLAD(params)
    if technique == "scancontext":
        from cslam_tpu.models.scancontext import ScanContext
        return ScanContext(params)
    from cslam_tpu.models.cosplace import CosPlace
    return CosPlace(params)
