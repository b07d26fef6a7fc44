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


def _smallest_eigvec3(A: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of a batch of symmetric
    3x3 matrices ``A [..., 3, 3]``, in closed form.

    Eigenvalues come from the trigonometric solution of the characteristic
    cubic (Smith '61); the eigenvector from Cayley-Hamilton:
    ``(A - l1 I)(A - l2 I) = (l3-l1)(l3-l2) v3 v3^T``, so any nonzero
    column of that product is the smallest-eigenvalue direction. All pure
    VPU arithmetic — XLA lowers batched ``jnp.linalg.eigh`` to a QR
    while-loop that measured ~25 ms of the 188 ms global-registration
    program at the production tier (benchmarks/global_reg_probe.py).
    Degenerate neighborhoods (isotropic, or collinear with two equal
    small eigenvalues) zero the product and fall back to +z — there the
    normal is ill-defined and FPFH's angles carry no signal anyway."""
    I3 = jnp.eye(3, dtype=A.dtype)
    q = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / 3.0
    Aq = A - q * I3
    p = jnp.sqrt(jnp.maximum(
        jnp.sum(Aq * Aq, axis=(-2, -1))[..., None, None] / 6.0, 1e-30))
    r = jnp.clip(jnp.linalg.det(Aq / p)[..., None, None] / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)                          # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)     # smallest
    lam2 = 3.0 * q - lam1 - lam3
    M = (A - lam1 * I3) @ (A - lam2 * I3)
    col = jnp.argmax(jnp.sum(M * M, axis=-2), axis=-1)         # [...]
    v = jnp.take_along_axis(M, col[..., None, None], axis=-1)[..., 0]
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ez = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(nrm > 1e-12, v / jnp.maximum(nrm, 1e-30), ez)


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
    n = _smallest_eigvec3(cov)                  # closed form, no eigh
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
    Returns per-yaw (R [3,3], t [3], score).

    The full linear cross-correlation runs in the frequency domain:
    ``irfft2(rfft2(Hd_pad) * conj(rfft2(Hs_pad)))`` over a 2G zero-padded
    grid, with the destination spectrum shared across all yaw hypotheses.
    The direct ``correlate2d`` form (a 64x64-kernel conv per yaw) measured
    111 ms of the 188 ms global-registration program at the production
    tier (benchmarks/global_reg_probe.py); the score surface is the same
    integer-valued count up to FFT rounding (~1e-3), so only exact ties
    can break differently — and the robust-ICP refine arbitrates those."""
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
    pad = 2 * _GRID
    Fd = jnp.fft.rfft2(Hd, s=(pad, pad))        # shared across yaws
    yaws = jnp.arange(n_yaw) * (2.0 * jnp.pi / n_yaw)

    def per_yaw(yaw):
        R = _yaw_matrix(yaw)
        moved = (src - cs) @ R.T
        Hs = _occupancy2d(moved, src_mask, cell, half)
        # c[s_u, s_v] = sum_xy Hs[x, y] * Hd[x + s_u, y + s_v], the shift
        # index s taken mod 2G; shifts in [-(G-1), G-1] cover correlate2d's
        # "full" output, the aliased row/col s = G is masked out
        c = jnp.fft.irfft2(Fd * jnp.conj(jnp.fft.rfft2(Hs, s=(pad, pad))),
                           s=(pad, pad))
        c = c.at[_GRID, :].set(-jnp.inf).at[:, _GRID].set(-jnp.inf)
        best = jnp.argmax(c)
        su = (best // pad).astype(jnp.int32)
        sv = (best % pad).astype(jnp.int32)
        su = jnp.where(su > _GRID, su - pad, su)
        sv = jnp.where(sv > _GRID, sv - pad, sv)
        dxy = jnp.stack([su, sv]).astype(jnp.float32) * cell
        # compose: p_dst = R (p_src - cs) + cd + [dxy, 0]
        # (z offset is left to the ICP refine)
        t = cd - R @ cs + jnp.concatenate(
            [dxy, jnp.zeros(1, dxy.dtype)])
        return R, t, c.reshape(-1)[best]

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


@jax.jit
@highest_precision
def _verify_pair_batch(src, sm, dst, dm, corr_dist, min_inliers,
                       min_inlier_ratio):
    """Fused geometric verification: multi-start ICP, prior-free global
    registration, inlier gating and arbitration — ONE dispatch per pair
    chunk, ONE readback.

    The previous two-stage flow (ICP batch -> host read -> global
    fallback over failures -> host read) serialized two device round
    trips per chunk, and 78% of the round-4 lidar-e2e chunks hit the
    fallback anyway (389/500; verify reads were 149 s of the 335 s steady
    wall). Running both candidate solvers speculatively costs the ~22%
    of global-registration work the fallback used to skip, but removes a
    full dispatch/read cycle, keeps the chunk on one fixed shape tier
    (the failure-count repad compiled its own 1..P tiers), and lets the
    decision run on device. Decision semantics are identical: the ICP
    result wins if it passes the gate; otherwise the higher-inlier
    candidate is taken and re-gated."""
    T0, inl0 = jax.vmap(
        lambda s, m, d, n: robust_registration(s, m, d, n, corr_dist)
    )(src, sm, dst, dm)
    Tg, inlg = jax.vmap(
        lambda s, m, d, n: global_registration(s, m, d, n, corr_dist)
    )(src, sm, dst, dm)
    n_src = jnp.maximum(jnp.sum(sm, axis=1), 1.0)

    def gate(inl):
        return (inl > min_inliers) & (inl / n_src > min_inlier_ratio)

    ok0 = gate(inl0)
    use_g = jnp.logical_and(jnp.logical_not(ok0), inlg > inl0)
    T = jnp.where(use_g[:, None, None], Tg, T0)
    inl = jnp.where(use_g, inlg, inl0)
    success = jnp.where(use_g, gate(inlg), ok0)
    return T, inl, success, ok0


class VerifyBatchHandle:
    """One fused-dispatch verification of a (<= max_pair_tier) pair chunk.

    ``compute_transform_batch_begin`` dispatches the whole decision
    (:func:`_verify_pair_batch`); one :func:`compute_transform_batch_step`
    harvest materializes ``results`` as the (Z, success) list. ``arrays``
    exposes the pending device results for ``device_read.prefetch``.
    """

    __slots__ = ("p", "T_dev", "inl_dev", "ok_dev", "ok_icp_dev", "results")

    @property
    def arrays(self):
        if self.results is None:
            return (self.T_dev, self.inl_dev, self.ok_dev, self.ok_icp_dev)
        return ()

    @property
    def done(self) -> bool:
        return self.results is not None


def compute_transform_batch_begin(pairs, voxel_size: float, min_inliers: int,
                                  pad_size: int = 1024,
                                  min_inlier_ratio: float = 0.6,
                                  max_pair_tier: int = 8
                                  ) -> list:
    """Dispatch batched verification without blocking. Returns one
    :class:`VerifyBatchHandle` per chunk of up to ``max_pair_tier`` pairs
    (each fresh pair tier costs a >1 min remote compile; warmups cover
    tiers up to the cap). Pair counts are padded to a power-of-two tier
    (repeating the last pair) so each tier compiles once."""
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
        src = np.stack([pad_cloud(s, pad_size)[0] for s, _ in padded])
        src_m = np.stack([pad_cloud(s, pad_size)[1] for s, _ in padded])
        dst = np.stack([pad_cloud(d, pad_size)[0] for _, d in padded])
        dst_m = np.stack([pad_cloud(d, pad_size)[1] for _, d in padded])
        h.results = None
        # numpy operands + dispatch-time prefetch: explicit device_puts
        # block behind the device queue and harvest-time reads pay a
        # relay RTT each (benchmarks/relay_dispatch_probe.py)
        from cslam_tpu.utils import device_read
        with profiling.span("verify.dispatch"):
            h.T_dev, h.inl_dev, h.ok_dev, h.ok_icp_dev = _verify_pair_batch(
                src, src_m, dst, dst_m,
                np.float32(float(voxel_size) * 1.5),
                np.float32(min_inliers),
                np.float32(min_inlier_ratio))
            device_read.prefetch(
                (h.T_dev, h.inl_dev, h.ok_dev, h.ok_icp_dev))
        handles.append(h)
    return handles


def compute_transform_batch_step(h: VerifyBatchHandle) -> bool:
    """Materialize a dispatched verification chunk (one harvest step);
    returns True once ``h.results`` is final."""
    from cslam_tpu.utils import profiling
    if h.results is None:
        with profiling.span("verify.read"):
            T = np.asarray(h.T_dev, np.float64)
            ok = np.asarray(h.ok_dev)
            ok_icp = np.asarray(h.ok_icp_dev)
        # VERDICT-4 #6 evidence: what fraction of pairs the cheap
        # multi-start ICP gate passes on its own (the complement is the
        # old "global-registration fallback rate" — with the fused
        # speculative dispatch it costs no extra round trips, but the
        # rate still says whether the ICP gating fits the overlap
        # distribution)
        profiling.counter("verify.pairs", h.p)
        profiling.counter("verify.icp_gate_pass", int(ok_icp[:h.p].sum()))
        h.results = [(np.linalg.inv(T[i]), bool(ok[i]))
                     for i in range(h.p)]
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
