"""Robust point-cloud registration in JAX (lidar geometric verification).

Functional replacement for the reference's TEASER++ GNC-TLS + ICP pipeline
(``cslam/lidar_pr/icp_utils.py:68-139``): candidate loop closures are
verified by estimating a relative SE(3) transform between two downsampled
clouds and thresholding the inlier count
(``registration_min_inliers``, reference ``icp_utils.py:121``).

TPU-native design (instead of translating TEASER's max-clique solver, which
is an inherently combinatorial host algorithm):
- correspondences by nearest neighbor through one big distance matmul,
- Welsch/TLS-style graduated reweighting of correspondences (GNC),
- weighted Kabsch (SVD) closed-form pose update,
- **batched multi-start over yaw hypotheses** (vmapped) for global
  convergence without features — the SLAM-relevant ambiguity is heading;
  the best hypothesis by final inlier count wins.

Everything is fixed-shape (clouds padded to tiers, masks for validity) and
runs as one jitted dispatch per verification.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cslam_tpu.ops import highest_precision


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Host-side voxel-grid downsampling (centroid per voxel), replacing
    Open3D's ``voxel_down_sample`` (reference ``icp_utils.py:93-100``)."""
    points = np.asarray(points, np.float64)
    points = points[np.all(np.isfinite(points), axis=1)]
    if len(points) == 0:
        return points.astype(np.float32)
    keys = np.floor(points / voxel_size).astype(np.int64)
    # pack voxel coords into one key (22 bits each, offset to positive)
    packed = ((keys[:, 0] + (1 << 20)) << 42 | (keys[:, 1] + (1 << 20)) << 21
              | (keys[:, 2] + (1 << 20)))
    order = np.argsort(packed, kind="stable")
    packed, points = packed[order], points[order]
    uniq, start, counts = np.unique(packed, return_index=True,
                                    return_counts=True)
    sums = np.add.reduceat(points, start, axis=0)
    return (sums / counts[:, None]).astype(np.float32)


def pad_cloud(points: np.ndarray, size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad/truncate to a fixed tier; returns (points [size,3], mask [size])."""
    points = np.asarray(points, np.float32)
    n = min(len(points), size)
    out = np.zeros((size, 3), np.float32)
    mask = np.zeros(size, np.float32)
    if n:
        idx = (np.arange(n) if len(points) <= size else
               np.linspace(0, len(points) - 1, size).astype(int))
        out[:n] = points[idx][:n]
        mask[:n] = 1.0
    return out, mask


def _yaw_matrix(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, -s, zero]),
                      jnp.stack([s, c, zero]),
                      jnp.stack([zero, zero, one])])


def _weighted_kabsch(src: jax.Array, dst: jax.Array,
                     w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Closed-form weighted rigid alignment src -> dst: returns (R, t)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    cs = jnp.sum(src * w[:, None], axis=0) / wsum
    cd = jnp.sum(dst * w[:, None], axis=0) / wsum
    H = ((src - cs) * w[:, None]).T @ (dst - cd)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = Vt.T @ D @ U.T
    t = cd - R @ cs
    return R, t


def _icp_once(src: jax.Array, src_mask: jax.Array, dst: jax.Array,
              dst_mask: jax.Array, R: jax.Array, t: jax.Array,
              scale_sq: jax.Array):
    """One robust ICP step: correspond, reweight (Welsch/GNC), realign."""
    moved = src @ R.T + t
    # pairwise squared distances via the matmul identity
    d2 = (jnp.sum(moved * moved, axis=1)[:, None]
          - 2.0 * moved @ dst.T
          + jnp.sum(dst * dst, axis=1)[None, :])
    d2 = jnp.where(dst_mask[None, :] > 0, d2, jnp.inf)
    nn = jnp.argmin(d2, axis=1)
    nn_d2 = jnp.take_along_axis(d2, nn[:, None], axis=1)[:, 0]
    matched = dst[nn]
    w = jnp.exp(-nn_d2 / jnp.maximum(scale_sq, 1e-12)) * src_mask
    R_new, t_new = _weighted_kabsch(src, matched, w)
    return R_new, t_new, nn_d2


@functools.partial(jax.jit, static_argnames=("iters", "start_scale"))
def _robust_icp_single(src, src_mask, dst, dst_mask, R0, t0,
                       corr_dist: jax.Array, iters: int,
                       start_scale: float = 8.0):
    """Graduated robust ICP from one initial pose. Returns (R, t, inliers).

    ``start_scale`` sets the initial robust-kernel radius (x corr_dist).
    Wide (8x) for coarse inits like the center-of-mass yaw sweep; keep it
    TIGHT (~2x) when the init is already trusted — under partial overlap a
    wide kernel lets src points with no true counterpart drag the pose
    toward their nearest unrelated structure (measured: refining from the
    GROUND-TRUTH pose at 8x drifted 1.7 m; at 2x it stays put).
    """
    # anneal the robust kernel scale from coarse to the inlier threshold
    def body(i, state):
        R, t = state
        frac = i.astype(jnp.float32) / max(iters - 1, 1)
        scale = corr_dist * (start_scale * (1.0 - frac) + 1.0)
        R, t, _ = _icp_once(src, src_mask, dst, dst_mask, R, t,
                            scale * scale)
        return (R, t)

    R, t = jax.lax.fori_loop(0, iters, body, (R0, t0))
    moved = src @ R.T + t
    d2 = (jnp.sum(moved * moved, axis=1)[:, None]
          - 2.0 * moved @ dst.T + jnp.sum(dst * dst, axis=1)[None, :])
    d2 = jnp.where(dst_mask[None, :] > 0, d2, jnp.inf)
    nn_d2 = jnp.min(d2, axis=1)
    inliers = jnp.sum((nn_d2 < corr_dist * corr_dist) * src_mask)
    return R, t, inliers


@functools.partial(jax.jit, static_argnames=("iters", "num_yaw_hypotheses",
                                              "coarse_stride", "refine_top"))
@highest_precision
def robust_registration(src: jax.Array, src_mask: jax.Array, dst: jax.Array,
                        dst_mask: jax.Array, corr_dist: float,
                        iters: int = 24, num_yaw_hypotheses: int = 8,
                        coarse_stride: int = 4, refine_top: int = 2):
    """Multi-start robust ICP: src -> dst transform.

    Returns (T [4,4], inlier count) of the best yaw hypothesis. The
    convention matches the reference's use: the returned transform maps
    src-frame coordinates into dst frame.

    Coarse-to-fine: the full yaw sweep runs on a ``coarse_stride``-strided
    src subset (the [N_src, N_dst] correspondence matrix each iteration is
    the cost center; pose estimation doesn't need every point), then only
    the ``refine_top`` best hypotheses by coarse inlier count are refined
    at full resolution with a tight robust kernel. The final inlier count
    (the success gate) is always full-resolution. ~4x less distance-matrix
    work than refining every hypothesis at full res, same decision flow.
    """
    yaws = jnp.arange(num_yaw_hypotheses) * (2 * jnp.pi / num_yaw_hypotheses)
    # center-of-mass initial translation per hypothesis
    ws, wd = (jnp.maximum(jnp.sum(src_mask), 1.0),
              jnp.maximum(jnp.sum(dst_mask), 1.0))
    cs = jnp.sum(src * src_mask[:, None], axis=0) / ws
    cd = jnp.sum(dst * dst_mask[:, None], axis=0) / wd

    src_c, mask_c = src[::coarse_stride], src_mask[::coarse_stride]

    def run_coarse(yaw):
        R0 = _yaw_matrix(yaw)
        t0 = cd - R0 @ cs
        return _robust_icp_single(src_c, mask_c, dst, dst_mask, R0, t0,
                                  jnp.float32(corr_dist), iters)

    Rs, ts, inl_c = jax.vmap(run_coarse)(yaws)
    _, top = jax.lax.top_k(inl_c, refine_top)

    def run_fine(R0, t0):
        # the init is a converged coarse pose: keep the kernel tight
        # (start_scale 2 — see _robust_icp_single's drift note)
        return _robust_icp_single(src, src_mask, dst, dst_mask, R0, t0,
                                  jnp.float32(corr_dist), max(iters // 3, 4),
                                  start_scale=2.0)

    Rf, tf, inliers = jax.vmap(run_fine)(Rs[top], ts[top])
    best = jnp.argmax(inliers)
    R, t = Rf[best], tf[best]
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t)
    return T, inliers[best]


# ---------------------------------------------------------------------------
# Correspondence-based global registration (no pose prior)
# ---------------------------------------------------------------------------
#
# The reference verifies candidates with NO initial guess: TEASER++ on FPFH
# correspondences (icp_utils.py:26-65,103-139). The multi-start ICP above
# sweeps yaw hypotheses only — a pair with large translation offset between
# viewpoints (partial overlap) biases the center-of-mass init outside every
# basin. This path closes that gap TPU-natively: FPFH descriptors built
# from fixed-shape matmul kNN + vmapped 3x3 eigendecompositions + one-hot
# histogram segment sums, mutual-NN matching by one descriptor matmul, and
# the GNC-TLS Kabsch core over the putative correspondences (the same
# graduated solver TEASER's rotation stage approximates), refined by robust
# ICP — all one jitted dispatch.


_FPFH_BINS = 11


def _knn(points: jax.Array, mask: jax.Array, k: int):
    """k nearest neighbors by squared distance: (idx [N,k], d2 [N,k])."""
    d2 = (jnp.sum(points * points, axis=1)[:, None]
          - 2.0 * points @ points.T
          + jnp.sum(points * points, axis=1)[None, :])
    d2 = jnp.where(mask[None, :] > 0, d2, jnp.inf)
    # exclude self (jnp.where, NOT  + eye*inf: 0*inf = NaN off-diagonal)
    d2 = jnp.where(jnp.eye(points.shape[0], dtype=bool), jnp.inf, d2)
    neg_d2, idx = jax.lax.top_k(-d2, k)
    return idx, -neg_d2


def _normals(points: jax.Array, mask: jax.Array, nn_idx: jax.Array
             ) -> jax.Array:
    """Per-point normals from neighborhood PCA, oriented toward the sensor
    origin (clouds are in the sensor frame, so the origin is the viewpoint
    — the same disambiguation FPFH uses)."""
    nbrs = points[nn_idx]                       # [N, k, 3]
    mean = jnp.mean(nbrs, axis=1, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered)
    cov = cov + 1e-9 * jnp.eye(3)
    _, vecs = jnp.linalg.eigh(cov)              # ascending eigenvalues
    n = vecs[:, :, 0]                           # smallest-eigval direction
    flip = jnp.sign(-jnp.sum(n * points, axis=1, keepdims=True))
    n = n * jnp.where(flip == 0, 1.0, flip)
    return n * mask[:, None]


def _spfh(points, normals, nn_idx, nn_d2, mask):
    """Simplified point feature histograms: the FPFH Darboux-angle triplet
    (alpha, phi, theta) hard-binned with one-hot segment sums."""
    k = nn_idx.shape[1]
    p = points[:, None, :]
    n_p = normals[:, None, :]
    q = points[nn_idx]                          # [N, k, 3]
    n_q = normals[nn_idx]
    d = q - p
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1, keepdims=True),
                                1e-12))
    du = d / dist
    u = jnp.broadcast_to(n_p, du.shape)
    v = jnp.cross(du, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * n_q, axis=-1)           # [-1, 1]
    phi = jnp.sum(u * du, axis=-1)              # [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * n_q, axis=-1),
                        jnp.sum(u * n_q, axis=-1))  # [-pi, pi]

    valid = mask[:, None] * mask[nn_idx] * (nn_d2 < jnp.inf)

    def hist(x, lo, hi):
        b = jnp.clip(((x - lo) / (hi - lo) * _FPFH_BINS).astype(jnp.int32),
                     0, _FPFH_BINS - 1)
        return jnp.sum(jax.nn.one_hot(b, _FPFH_BINS) * valid[..., None],
                       axis=1)                  # [N, BINS]

    h = jnp.concatenate([hist(alpha, -1.0, 1.0), hist(phi, -1.0, 1.0),
                         hist(theta, -jnp.pi, jnp.pi)], axis=1)
    return h / jnp.maximum(jnp.sum(h, axis=1, keepdims=True), 1e-9)


def _fpfh(points: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """FPFH: SPFH re-aggregated over the neighborhood with 1/dist weights
    (Rusu et al.; reference gets these from Open3D, icp_utils.py:26-40)."""
    nn_idx, nn_d2 = _knn(points, mask, k)
    normals = _normals(points, mask, nn_idx)
    spfh = _spfh(points, normals, nn_idx, nn_d2, mask)
    wgt = 1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(nn_d2, 1e-12)), 1e-6)
    wgt = wgt * (nn_d2 < jnp.inf)
    neighbor_term = (jnp.sum(spfh[nn_idx] * wgt[..., None], axis=1)
                     / jnp.maximum(jnp.sum(wgt, axis=1, keepdims=True),
                                   1e-9))
    f = spfh + neighbor_term
    return f * mask[:, None]


_GRID = 64


def _occupancy2d(pts: jax.Array, mask: jax.Array, cell: jax.Array,
                 half_extent: jax.Array) -> jax.Array:
    """Binarized XY occupancy grid [G, G] (one-hot segment sum — no
    scatter)."""
    ij = jnp.floor((pts[:, :2] + half_extent) / cell).astype(jnp.int32)
    inb = (mask > 0) & jnp.all((ij >= 0) & (ij < _GRID), axis=1)
    flat = jnp.clip(ij[:, 0] * _GRID + ij[:, 1], 0, _GRID * _GRID - 1)
    h = jnp.sum(jax.nn.one_hot(flat, _GRID * _GRID) * inb[:, None], axis=0)
    return (h.reshape(_GRID, _GRID) > 0).astype(jnp.float32)


def _yaw_correlation_candidates(src, src_mask, dst, dst_mask, n_yaw: int):
    """Dense global SE(2)-ish search: for each yaw hypothesis, find the
    best XY translation by cross-correlating binarized occupancy grids
    (walls/structure correlate sharply where point descriptors alias).
    Returns per-yaw (R [3,3], t [3], score)."""
    ws = jnp.maximum(jnp.sum(src_mask), 1.0)
    wd = jnp.maximum(jnp.sum(dst_mask), 1.0)
    cs = jnp.sum(src * src_mask[:, None], axis=0) / ws
    cd = jnp.sum(dst * dst_mask[:, None], axis=0) / wd
    # grid sized to the larger cloud's XY extent around its centroid
    def extent(pts, mask, c):
        r = jnp.abs(pts[:, :2] - c[:2]) * mask[:, None]
        return jnp.max(r)
    half = jnp.maximum(extent(src, src_mask, cs),
                       extent(dst, dst_mask, cd)) * 1.05 + 1e-3
    cell = 2.0 * half / _GRID
    Hd = _occupancy2d(dst - cd, dst_mask, cell, half)
    yaws = jnp.arange(n_yaw) * (2.0 * jnp.pi / n_yaw)

    def per_yaw(yaw):
        R = _yaw_matrix(yaw)
        moved = (src - cs) @ R.T
        Hs = _occupancy2d(moved, src_mask, cell, half)
        # full cross-correlation: score[u, v] = sum_xy Hs[x, y] *
        # Hd[x + u - (G-1), y + v - (G-1)]
        corr = jax.scipy.signal.correlate2d(Hd, Hs, mode="full")
        best = jnp.argmax(corr)
        u, v = best // (2 * _GRID - 1), best % (2 * _GRID - 1)
        dxy = (jnp.stack([u, v]).astype(jnp.float32)
               - (_GRID - 1)) * cell
        # compose: p_dst = R (p_src - cs) + cd + [dxy, 0]
        # (z offset is left to the ICP refine)
        t = cd - R @ cs + jnp.concatenate(
            [dxy, jnp.zeros(1, dxy.dtype)])
        return R, t, corr.reshape(-1)[best]

    return jax.vmap(per_yaw)(yaws)


def _spectral_inliers(p, q, cand, eps, min_sep, iters: int = 50):
    """Pairwise-distance-consistency inlier selection (spectral matching,
    Leordeanu & Hebert '05) — the TPU-shaped stand-in for TEASER++'s PMC
    max-clique filter (reference icp_utils.py:68-83): rigid motion
    preserves pairwise distances, so true correspondences form a dense
    block of the compatibility matrix; its principal eigenvector (a few
    MXU power-iteration matvecs) localizes on that block.

    ``cand`` masks candidate correspondences p[i] -> q[i]; min_sep
    suppresses trivially-compatible near-duplicate pairs. Returns a
    0/1 weight vector (falls back to ``cand`` when fewer than 3 survive
    — e.g. cross-scene pairs with no consistent cluster)."""
    dp = jnp.sqrt(jnp.maximum(
        jnp.sum((p[:, None, :] - p[None, :, :]) ** 2, axis=-1), 0.0))
    dq = jnp.sqrt(jnp.maximum(
        jnp.sum((q[:, None, :] - q[None, :, :]) ** 2, axis=-1), 0.0))
    C = ((jnp.abs(dp - dq) < eps) & (dp > min_sep)).astype(p.dtype)
    C = C * cand[:, None] * cand[None, :]
    C = C * (1.0 - jnp.eye(p.shape[0], dtype=p.dtype))

    def body(_, v):
        v = C @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

    v0 = cand + 1e-3
    v = jax.lax.fori_loop(0, iters, body, v0)
    sel = (v > 0.3 * jnp.max(v)).astype(p.dtype) * cand
    return jnp.where(jnp.sum(sel) >= 3.0, sel, cand)


def _fpfh_alignment(src, src_mask, dst, dst_mask, corr_dist, k: int):
    """FPFH mutual-NN correspondences, spectral distance-consistency
    filtering, then the GNC-TLS Kabsch core — the reference's TEASER++
    recipe (icp_utils.py:103-139). Returns the aligned point-map
    hypothesis T0 [4,4] (src -> dst)."""
    from cslam_tpu.ops.visual_registration import _gnc_align_core

    fa = _fpfh(src, src_mask, k)
    fb = _fpfh(dst, dst_mask, k)
    d2 = (jnp.sum(fa * fa, axis=1)[:, None] - 2.0 * fa @ fb.T
          + jnp.sum(fb * fb, axis=1)[None, :])
    d2 = jnp.where((src_mask[:, None] > 0) & (dst_mask[None, :] > 0),
                   d2, jnp.inf)
    j_of_i = jnp.argmin(d2, axis=1)
    i_of_j = jnp.argmin(d2, axis=0)
    mutual = ((i_of_j[j_of_i] == jnp.arange(src.shape[0]))
              & (src_mask > 0)).astype(src.dtype)
    # FPFH mutual-NN sets on aliased geometry run ~90%+ outliers — past
    # what GNC alone tolerates; the spectral filter first distills the
    # distance-consistent cluster (measured 6.7% -> 100% inlier purity
    # on the synthetic-walls adversarial pair)
    w = _spectral_inliers(src, dst[j_of_i], mutual,
                          eps=corr_dist * 0.5, min_sep=corr_dist * 2.0)
    T0, _ = _gnc_align_core(src, dst[j_of_i], w,
                            inlier_dist=corr_dist * 2.0, iters=16)
    return T0


@functools.partial(jax.jit, static_argnames=("k", "icp_iters", "n_yaw"))
@highest_precision
def global_registration(src: jax.Array, src_mask: jax.Array,
                        dst: jax.Array, dst_mask: jax.Array,
                        corr_dist: float, k: int = 16,
                        icp_iters: int = 24, n_yaw: int = 32):
    """Prior-free global registration + robust ICP refinement.

    Two independent candidate generators run in one dispatch and the
    final robust-ICP inlier count arbitrates:

    - dense yaw x translation search (occupancy-grid cross-correlation —
      robust where descriptors alias, e.g. repeated wall geometry),
    - FPFH mutual-NN correspondences through the GNC-TLS Kabsch core
      (the reference's TEASER++ recipe, icp_utils.py:103-139 — sharper
      where the scene has distinctive local structure).

    Returns (T [4,4] point map src->dst, icp inlier count) — same
    contract as :func:`robust_registration`.
    """
    # candidate set A: best-correlation yaw/translation hypotheses
    Rs, ts, scores = _yaw_correlation_candidates(src, src_mask, dst,
                                                 dst_mask, n_yaw)

    # candidate B: FPFH correspondence alignment
    T0 = _fpfh_alignment(src, src_mask, dst, dst_mask, corr_dist, k)

    # refine the top-correlation hypothesis and the FPFH hypothesis with
    # robust ICP; the inlier count picks the winner
    top = jnp.argmax(scores)
    R_init = jnp.stack([Rs[top], T0[:3, :3]])
    t_init = jnp.stack([ts[top], T0[:3, 3]])
    Rf, tf, inl = jax.vmap(
        lambda R0, t0: _robust_icp_single(
            src, src_mask, dst, dst_mask, R0, t0,
            jnp.float32(corr_dist), icp_iters,
            start_scale=2.0))(R_init, t_init)
    best = jnp.argmax(inl)
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(Rf[best]).at[:3, 3].set(tf[best])
    return T, inl[best]


@functools.partial(jax.jit, static_argnames=("iters", "num_yaw_hypotheses"))
@highest_precision
def robust_registration_batch(src, src_mask, dst, dst_mask, corr_dist: float,
                              iters: int = 24, num_yaw_hypotheses: int = 8):
    """Vmapped :func:`robust_registration` over ``[P, N, 3]`` cloud pairs:
    one dispatch verifies a whole batch of candidate loop closures (each
    per-pair dispatch otherwise costs a full relay round-trip)."""
    return jax.vmap(
        lambda s, sm, d, dm: robust_registration(
            s, sm, d, dm, corr_dist, iters, num_yaw_hypotheses)
    )(src, src_mask, dst, dst_mask)


@functools.partial(jax.jit, static_argnames=("k", "icp_iters", "n_yaw"))
@highest_precision
def global_registration_batch(src, src_mask, dst, dst_mask, corr_dist: float,
                              k: int = 16, icp_iters: int = 24,
                              n_yaw: int = 32):
    """Vmapped :func:`global_registration` over ``[P, N, 3]`` cloud pairs."""
    return jax.vmap(
        lambda s, sm, d, dm: global_registration(
            s, sm, d, dm, corr_dist, k, icp_iters, n_yaw)
    )(src, src_mask, dst, dst_mask)


class VerifyBatchHandle:
    """Staged verification of one (<= max_pair_tier) pair chunk.

    Stage 0: multi-start ICP dispatched, results pending on device.
    Stage 1: global-registration fallback dispatched for the ICP failures.
    Stage 2: done — ``results`` holds the (Z, success) list.
    Advance with :func:`compute_transform_batch_step`; ``arrays`` exposes
    the stage's pending device results for ``device_read.prefetch``.
    """

    __slots__ = ("p", "src", "src_m", "dst", "dst_m", "corr_dist",
                 "min_inliers", "min_inlier_ratio", "T_dev", "inl_dev",
                 "T", "inl", "success", "failed", "stage", "results")

    @property
    def arrays(self):
        if self.stage <= 1:
            return (self.T_dev, self.inl_dev)
        return ()

    @property
    def done(self) -> bool:
        return self.stage >= 2


def compute_transform_batch_begin(pairs, voxel_size: float, min_inliers: int,
                                  pad_size: int = 1024,
                                  min_inlier_ratio: float = 0.6,
                                  max_pair_tier: int = 8
                                  ) -> list:
    """Dispatch the first (ICP) stage of batched verification without
    blocking. Returns one :class:`VerifyBatchHandle` per chunk of up to
    ``max_pair_tier`` pairs (each fresh pair tier costs a >1 min remote
    compile; warmups cover tiers up to the cap). Pair counts are padded to
    a power-of-two tier (repeating the last pair) so each tier compiles
    once."""
    from cslam_tpu.utils import profiling
    handles = []
    for c in range(0, len(pairs), max_pair_tier):
        chunk = pairs[c:c + max_pair_tier]
        p = len(chunk)
        tier = 1
        while tier < p:
            tier *= 2
        padded = list(chunk) + [chunk[-1]] * (tier - p)
        h = VerifyBatchHandle()
        h.p = p
        h.src = np.stack([pad_cloud(s, pad_size)[0] for s, _ in padded])
        h.src_m = np.stack([pad_cloud(s, pad_size)[1] for s, _ in padded])
        h.dst = np.stack([pad_cloud(d, pad_size)[0] for _, d in padded])
        h.dst_m = np.stack([pad_cloud(d, pad_size)[1] for _, d in padded])
        h.corr_dist = float(voxel_size) * 1.5
        h.min_inliers = min_inliers
        h.min_inlier_ratio = min_inlier_ratio
        h.stage = 0
        h.results = None
        with profiling.span("verify.icp_dispatch"):
            h.T_dev, h.inl_dev = robust_registration_batch(
                jnp.asarray(h.src), jnp.asarray(h.src_m),
                jnp.asarray(h.dst), jnp.asarray(h.dst_m),
                corr_dist=h.corr_dist)
        handles.append(h)
    return handles


def compute_transform_batch_step(h: VerifyBatchHandle) -> bool:
    """Advance a staged verification chunk by one harvest step; returns
    True once ``h.results`` is final. Stage 0 reads the ICP results and
    dispatches the global-registration fallback over just the failures
    (its FPFH + dense yaw-correlation stage is ~4x the ICP sweep's cost);
    stage 1 reads the fallback and merges winners."""
    from cslam_tpu.utils import profiling
    if h.stage == 0:
        # np.asarray on device arrays returns read-only views; the merge
        # step writes winners in place
        with profiling.span("verify.icp_read"):
            h.T, h.inl = np.array(h.T_dev), np.array(h.inl_dev)
        n_src = np.maximum(h.src_m.sum(axis=1), 1.0)

        def gate(count, i):
            return (int(count) > h.min_inliers
                    and float(count) / n_src[i] > h.min_inlier_ratio)

        h.success = [gate(h.inl[i], i) for i in range(h.p)]
        h.failed = [i for i in range(h.p) if not h.success[i]]
        if not h.failed:
            h.results = [
                (np.linalg.inv(np.asarray(h.T[i], np.float64)), h.success[i])
                for i in range(h.p)]
            h.stage = 2
            return True
        ftier = 1
        while ftier < len(h.failed):
            ftier *= 2
        fidx = h.failed + [h.failed[-1]] * (ftier - len(h.failed))
        with profiling.span("verify.global_dispatch"):
            h.T_dev, h.inl_dev = global_registration_batch(
                jnp.asarray(h.src[fidx]), jnp.asarray(h.src_m[fidx]),
                jnp.asarray(h.dst[fidx]), jnp.asarray(h.dst_m[fidx]),
                corr_dist=h.corr_dist)
        h.stage = 1
        return False
    if h.stage == 1:
        with profiling.span("verify.global_read"):
            T_g, inl_g = np.asarray(h.T_dev), np.asarray(h.inl_dev)
        n_src = np.maximum(h.src_m.sum(axis=1), 1.0)
        for j, i in enumerate(h.failed):
            if int(inl_g[j]) > int(h.inl[i]):
                h.T[i], h.inl[i] = T_g[j], inl_g[j]
                h.success[i] = (
                    int(inl_g[j]) > h.min_inliers
                    and float(inl_g[j]) / n_src[i] > h.min_inlier_ratio)
        h.results = [
            (np.linalg.inv(np.asarray(h.T[i], np.float64)), h.success[i])
            for i in range(h.p)]
        h.stage = 2
    return True


def compute_transform_batch(pairs, voxel_size: float, min_inliers: int,
                            pad_size: int = 1024,
                            min_inlier_ratio: float = 0.6,
                            max_pair_tier: int = 8):
    """Batched :func:`compute_transform`: verify several candidate pairs in
    (up to) two device dispatches — one multi-start ICP batch, then one
    prior-free global-registration batch over only the pairs the first
    stage failed. Decision flow and returned (Z, success) per pair are
    identical to calling :func:`compute_transform` in a loop. Synchronous
    driver over the staged begin/step API (see
    :func:`compute_transform_batch_begin`).
    """
    if not pairs:
        return []
    out = []
    for h in compute_transform_batch_begin(
            pairs, voxel_size, min_inliers, pad_size=pad_size,
            min_inlier_ratio=min_inlier_ratio, max_pair_tier=max_pair_tier):
        while not compute_transform_batch_step(h):
            pass
        out.extend(h.results)
    return out


def compute_transform(src_points: np.ndarray, dst_points: np.ndarray,
                      voxel_size: float, min_inliers: int,
                      pad_size: int = 1024,
                      min_inlier_ratio: float = 0.6
                      ) -> Tuple[np.ndarray, bool]:
    """Verify a candidate loop closure between two clouds.

    Same contract as reference ``icp_utils.compute_transform``
    (``icp_utils.py:178-196``): returns (transform, success) with success =
    enough inlier correspondences. The returned transform uses the pose
    convention the back end's BetweenFactor expects, Z = X_src^-1 X_dst —
    i.e. the *inverse* of the point map estimated by the ICP (points
    expressed in src's sensor frame map into dst's frame by X_dst^-1 X_src;
    the reference's TEASER note "computes the transform from dst to src",
    icp_utils.py:182, is the same convention).
    """
    src, src_mask = pad_cloud(src_points, pad_size)
    dst, dst_mask = pad_cloud(dst_points, pad_size)
    corr_dist = float(voxel_size) * 1.5
    T_pointmap, inliers = robust_registration(
        jnp.asarray(src), jnp.asarray(src_mask), jnp.asarray(dst),
        jnp.asarray(dst_mask), corr_dist=corr_dist)
    # success needs both an absolute count and a ratio: point-to-point
    # inliers are easy to amass from trivial structure (e.g. two ground
    # planes aligning), so unlike the reference's feature-correspondence
    # inliers (icp_utils.py:121) a bare count gate is too permissive
    n_src = max(float(src_mask.sum()), 1.0)

    def gate(count):
        return (int(count) > min_inliers
                and float(count) / n_src > min_inlier_ratio)

    success = gate(inliers)
    if not success:
        # the yaw sweep's center-of-mass init fails on pairs with large
        # viewpoint translation (partial overlap biases the centroid);
        # fall back to prior-free FPFH-correspondence registration, the
        # role TEASER++ plays in the reference (icp_utils.py:103-139)
        T_g, inl_g = global_registration(
            jnp.asarray(src), jnp.asarray(src_mask), jnp.asarray(dst),
            jnp.asarray(dst_mask), corr_dist=corr_dist)
        if int(inl_g) > int(inliers):
            T_pointmap, inliers = T_g, inl_g
            success = gate(inl_g)
    Z = np.linalg.inv(np.asarray(T_pointmap, np.float64))
    return Z, success
