"""Stage-level wall-clock probe for ``global_registration_batch``.

The lidar e2e steady state spends ~105 s (269 ms x 389 batches) waiting on
the global-registration fallback (``ops/registration.py``) — the largest
device-compute line after the MAC solves. This probe times each internal
stage as its own jitted dispatch at the production tier (P pairs x N=1024
points) so optimization is evidence-driven rather than guessed. Suspects:

- ``_normals``: vmapped batched 3x3 ``jnp.linalg.eigh`` (XLA lowers small
  symmetric eigendecompositions to a QR while-loop — historically slow on
  TPU; a closed-form 3x3 path would be pure VPU arithmetic),
- ``_knn``: [N, N] distance matrix + ``lax.top_k(k=16)`` (top_k sorts),
- the robust-ICP refine: 2 hypotheses x icp_iters x [N, N] argmin sweeps,
- ``_yaw_correlation_candidates``: 32 x correlate2d(64x64, full).

Timing protocol (BENCH.md / memory: axon-bench-pitfall): every trial uses
fresh random inputs (the relay serves identical-value re-dispatches from a
cache) and each dispatch is followed by a forced read. Stage timings
include one ~30 ms relay RTT each — comparable across stages, and the
full-program row anchors the absolute scale.

Run: ``python benchmarks/global_reg_probe.py [--pairs 8] [--trials 5]``.
"""
import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from cslam_tpu.ops import highest_precision
from cslam_tpu.ops.registration import (_fpfh, _fpfh_alignment, _knn,
                                        _normals, _robust_icp_single,
                                        _spectral_inliers,
                                        _yaw_correlation_candidates,
                                        global_registration_batch,
                                        robust_registration_batch)

N = 1024          # production pad_size in the verify plane
K = 16
N_YAW = 32
ICP_ITERS = 24
CORR = 0.75       # voxel 0.5 * 1.5, the e2e setting


def make_pairs(rng, p):
    """P partial-overlap rigid pairs with ~70% valid points."""
    src = np.zeros((p, N, 3), np.float32)
    dst = np.zeros((p, N, 3), np.float32)
    sm = np.zeros((p, N), np.float32)
    dm = np.zeros((p, N), np.float32)
    n = int(N * 0.7)
    for i in range(p):
        pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
        pts[:, 2] *= 0.2
        ang = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = rng.uniform(-3, 3, 3).astype(np.float32)
        src[i, :n], dst[i, :n] = pts, pts @ R.T + t
        sm[i, :n] = dm[i, :n] = 1.0
    return (jnp.asarray(src), jnp.asarray(sm),
            jnp.asarray(dst), jnp.asarray(dm))


# --- per-stage jitted programs (vmapped over the pair axis) --------------

@functools.partial(jax.jit, static_argnames=("k",))
@highest_precision
def stage_knn(src, sm, k=K):
    idx, d2 = jax.vmap(lambda s, m: _knn(s, m, k))(src, sm)
    return jnp.sum(idx) + jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0))


@functools.partial(jax.jit, static_argnames=("k",))
@highest_precision
def stage_normals(src, sm, k=K):
    def one(s, m):
        nn_idx, _ = _knn(s, m, k)
        return _normals(s, m, nn_idx)
    return jnp.sum(jax.vmap(one)(src, sm))


@functools.partial(jax.jit, static_argnames=("k",))
@highest_precision
def stage_fpfh(src, sm, k=K):
    return jnp.sum(jax.vmap(lambda s, m: _fpfh(s, m, k))(src, sm))


@functools.partial(jax.jit, static_argnames=("n_yaw",))
@highest_precision
def stage_yawcorr(src, sm, dst, dm, n_yaw=N_YAW):
    _, ts, scores = jax.vmap(
        lambda s, m, d, n: _yaw_correlation_candidates(s, m, d, n, n_yaw)
    )(src, sm, dst, dm)
    return jnp.sum(ts) + jnp.sum(scores)


@jax.jit
@highest_precision
def stage_spectral(src, sm, dst):
    # candidate correspondences: index-aligned (shape-representative load)
    def one(p, m, q):
        return _spectral_inliers(p, q, m, eps=CORR * 0.5,
                                 min_sep=CORR * 2.0)
    return jnp.sum(jax.vmap(one)(src, sm, dst))


@functools.partial(jax.jit, static_argnames=("k",))
@highest_precision
def stage_fpfh_alignment(src, sm, dst, dm, k=K):
    T0 = jax.vmap(
        lambda s, m, d, n: _fpfh_alignment(s, m, d, n, CORR, k)
    )(src, sm, dst, dm)
    return jnp.sum(T0)


@functools.partial(jax.jit, static_argnames=("iters",))
@highest_precision
def stage_icp_refine(src, sm, dst, dm, iters=ICP_ITERS):
    def one(s, m, d, n):
        R0 = jnp.stack([jnp.eye(3), jnp.eye(3)])
        t0 = jnp.zeros((2, 3))
        Rf, tf, inl = jax.vmap(
            lambda R, t: _robust_icp_single(
                s, m, d, n, R, t, jnp.float32(CORR), iters,
                start_scale=2.0))(R0, t0)
        return jnp.sum(Rf) + jnp.sum(tf) + jnp.sum(inl)
    return jnp.sum(jax.vmap(one)(src, sm, dst, dm))


STAGES = [
    ("knn_topk", lambda a: stage_knn(a[0], a[1])),
    ("normals_eigh (incl knn)", lambda a: stage_normals(a[0], a[1])),
    ("fpfh_total (incl knn+normals)", lambda a: stage_fpfh(a[0], a[1])),
    ("yaw_correlation_x32", lambda a: stage_yawcorr(*a)),
    ("spectral_inliers", lambda a: stage_spectral(a[0], a[1], a[2])),
    ("fpfh_alignment (fpfh+match+spectral+gnc)",
     lambda a: stage_fpfh_alignment(*a)),
    ("icp_refine_x2 (24 iters)", lambda a: stage_icp_refine(*a)),
    ("FULL global_registration_batch",
     lambda a: global_registration_batch(*a, corr_dist=CORR)[1]),
    ("stage0 robust_registration_batch",
     lambda a: robust_registration_batch(*a, corr_dist=CORR)[1]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    rows = []
    for name, fn in STAGES:
        # warm twice with fresh values (relay can recompile after one)
        for _ in range(2):
            np.asarray(fn(make_pairs(rng, args.pairs)))
        samples = []
        for _ in range(args.trials):
            a = make_pairs(rng, args.pairs)
            t0 = time.perf_counter()
            np.asarray(fn(a))  # forced read serializes honestly
            samples.append((time.perf_counter() - t0) * 1e3)
        med = float(np.median(samples))
        rows.append({"stage": name, "median_ms": round(med, 2),
                     "min_ms": round(min(samples), 2),
                     "max_ms": round(max(samples), 2)})
        print(f"# {name}: median {med:.1f} ms "
              f"(min {min(samples):.1f}, max {max(samples):.1f})")

    print(json.dumps({
        "metric": "global_registration_stage_breakdown",
        "pairs": args.pairs, "points": N, "unit": "ms",
        "platform": jax.devices()[0].platform,
        "stages": rows,
    }))


if __name__ == "__main__":
    main()
