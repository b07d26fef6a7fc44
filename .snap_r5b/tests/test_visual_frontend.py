"""Visual front end tests: native features, stereo depth, RGB-D verification.

Uses a synthetic pinhole world: textured 3D landmarks rendered into images,
so FAST/BRIEF find and re-identify real corners across views and the full
feature -> match -> GNC-align verification chain runs end to end.
"""
import numpy as np
import pytest

from cslam_tpu import native
from cslam_tpu.native import fallback
from cslam_tpu.ops import visual_registration as vreg
from cslam_tpu.runtime.bus import MessageBus, RobotContext
from cslam_tpu.runtime.clock import VirtualClock
from cslam_tpu.runtime.rgbd_frontend import (CameraModel, RGBDFrontEnd,
                                             StereoFrontEnd)
from cslam_tpu.types import LocalDescriptorsRequest, Odometry

CAM = CameraModel(fx=300.0, fy=300.0, cx=160.0, cy=120.0, baseline=0.2)
W, H = 320, 240


def make_world(rng, n=120):
    """Landmarks in front of the origin camera, each with a unique texture."""
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                    rng.uniform(4, 10, n)], axis=1)
    textures = rng.integers(30, 255, (n, 11, 11), dtype=np.int64)
    return pts, textures


def render(pts, textures, pose, depth_too=True):
    """Pinhole render: stamp each landmark's texture at its projection."""
    img = np.full((H, W), 10, np.uint8)
    depth = np.zeros((H, W), np.float32)
    inv = np.linalg.inv(pose)
    cam_pts = pts @ inv[:3, :3].T + inv[:3, 3]
    order = np.argsort(-cam_pts[:, 2])  # far to near
    for i in order:
        x, y, z = cam_pts[i]
        if z < 0.5:
            continue
        u = int(round(CAM.fx * x / z + CAM.cx))
        v = int(round(CAM.fy * y / z + CAM.cy))
        if not (20 <= u < W - 20 and 20 <= v < H - 20):
            continue
        img[v - 5:v + 6, u - 5:u + 6] = textures[i].astype(np.uint8)
        depth[v - 5:v + 6, u - 5:u + 6] = z
    return (img, depth) if depth_too else img


def pose_xyz_yaw(x, y, z, yaw=0.0):
    T = np.eye(4)
    T[:3, :3] = [[np.cos(yaw), -np.sin(yaw), 0],
                 [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]]
    T[:3, 3] = [x, y, z]
    return T


class TestNativeFeatures:

    def test_native_matches_fallback_oracle(self):
        rng = np.random.default_rng(0)
        pts, tex = make_world(rng)
        img, _ = render(pts, tex, np.eye(4))
        xy_n, _ = native.fast_detect(img, 25, 300)
        xy_f, _ = fallback.fast_detect(img, 25, 10000)
        set_f = set(map(tuple, xy_f.tolist()))
        assert len(xy_n) > 30
        assert all(tuple(p) in set_f for p in xy_n.tolist())
        desc_n = native.brief_describe(img, xy_n)
        desc_f = fallback.brief_describe(img, xy_n)
        np.testing.assert_array_equal(desc_n, desc_f)

    def test_ratio_match_native_matches_fallback(self):
        """Lowe-ratio + zero-descriptor exclusion: C++ and numpy paths
        must produce identical match sets."""
        rng = np.random.default_rng(9)
        a = rng.integers(0, 256, (60, 32), dtype=np.uint8)
        b = rng.integers(0, 256, (70, 32), dtype=np.uint8)
        b[5] = a[3]          # exact match
        b[11] = a[3]         # ambiguous duplicate (ratio test target)
        a[7] = 0             # border sentinel must be excluded
        b[9] = 0
        for ratio in (0.0, 0.8, 1.0):
            m_native = native.hamming_match(a, b, max_dist=200, ratio=ratio)
            m_fb = fallback.hamming_match(a, b, max_dist=200, ratio=ratio)
            np.testing.assert_array_equal(m_native, m_fb)
            for i, j in m_native:
                assert a[i].any() and b[j].any()  # no sentinel matches

    def test_matching_across_translated_view(self):
        rng = np.random.default_rng(1)
        pts, tex = make_world(rng)
        img_a, _ = render(pts, tex, np.eye(4))
        img_b, _ = render(pts, tex, pose_xyz_yaw(0.2, 0.1, 0.0))
        kp_a, _ = native.fast_detect(img_a, 25, 300)
        kp_b, _ = native.fast_detect(img_b, 25, 300)
        pairs = native.hamming_match(native.brief_describe(img_a, kp_a),
                                     native.brief_describe(img_b, kp_b),
                                     max_dist=40)
        assert len(pairs) > 20


class TestVisualVerification:

    def test_gnc_align_with_outliers(self):
        rng = np.random.default_rng(2)
        src = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        T = pose_xyz_yaw(1.0, -0.5, 0.2, yaw=0.4)
        dst = (src @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        dst[::7] += rng.uniform(3, 6, (len(dst[::7]), 3))  # ~14% outliers
        import jax.numpy as jnp
        from cslam_tpu.ops.visual_registration import gnc_align
        T_est, inliers = gnc_align(jnp.asarray(src), jnp.asarray(dst),
                                   jnp.ones(100), inlier_dist=0.2)
        np.testing.assert_allclose(np.asarray(T_est), T, atol=0.02)
        assert 80 <= int(inliers) <= 90

    def test_verify_keyframe_pair_convention(self):
        """Returned transform must be the BetweenFactor measurement
        Z = X_a^-1 X_b."""
        rng = np.random.default_rng(3)
        pts, tex = make_world(rng)
        Xa = pose_xyz_yaw(0, 0, 0)
        Xb = pose_xyz_yaw(0.4, 0.2, 0.0, yaw=0.1)
        img_a, dep_a = render(pts, tex, Xa)
        img_b, dep_b = render(pts, tex, Xb)
        kp_a, _ = native.fast_detect(img_a, 25, 300)
        kp_b, _ = native.fast_detect(img_b, 25, 300)
        feats = {}
        for tag, img, dep, kp in (("a", img_a, dep_a, kp_a),
                                  ("b", img_b, dep_b, kp_b)):
            feats[tag] = (vreg.project_to_3d(kp, dep, CAM.fx, CAM.fy,
                                             CAM.cx, CAM.cy),
                          native.brief_describe(img, kp))
        Z, success, inliers = vreg.verify_keyframe_pair(
            feats["a"][0], feats["a"][1], feats["b"][0], feats["b"][1],
            min_inliers=6, inlier_dist=0.3)
        assert success and inliers > 10
        Z_gt = np.linalg.inv(Xa) @ Xb
        np.testing.assert_allclose(Z[:3, 3], Z_gt[:3, 3], atol=0.1)
        np.testing.assert_allclose(Z[:3, :3], Z_gt[:3, :3], atol=0.05)

    def test_batched_verification_matches_single(self):
        """gnc_align_batch over P pairs must reproduce per-pair results,
        including pairs that fail descriptor matching (no device work) and
        padding slots (power-of-two pair tier)."""
        rng = np.random.default_rng(6)
        pts, tex = make_world(rng)
        pts_other, tex_other = make_world(np.random.default_rng(123))
        views = []
        for pose in (np.eye(4), pose_xyz_yaw(0.3, 0.1, 0, yaw=0.05),
                     pose_xyz_yaw(-0.2, 0.3, 0, yaw=-0.1)):
            img, dep = render(pts, tex, pose)
            kp, _ = native.fast_detect(img, 25, 300)
            views.append((vreg.project_to_3d(kp, dep, CAM.fx, CAM.fy,
                                             CAM.cx, CAM.cy),
                          native.brief_describe(img, kp)))
        img_u, dep_u = render(pts_other, tex_other, np.eye(4))
        kp_u, _ = native.fast_detect(img_u, 25, 300)
        unrelated = (vreg.project_to_3d(kp_u, dep_u, CAM.fx, CAM.fy,
                                        CAM.cx, CAM.cy),
                     native.brief_describe(img_u, kp_u))
        # 3 pairs (tier pads to 4): two real overlaps + one unrelated
        pair_list = [(views[0][0], views[0][1], views[1][0], views[1][1]),
                     (views[0][0], views[0][1], unrelated[0], unrelated[1]),
                     (views[1][0], views[1][1], views[2][0], views[2][1])]
        batched = vreg.verify_keyframe_pairs(pair_list, min_inliers=10)
        singles = [vreg.verify_keyframe_pair(*p, min_inliers=10)
                   for p in pair_list]
        for (Tb, sb, nb), (Ts, ss, ns) in zip(batched, singles):
            assert sb == ss and nb == ns
            np.testing.assert_allclose(Tb, Ts, atol=1e-5)
        assert batched[0][1] and batched[2][1] and not batched[1][1]

    def test_unrelated_scenes_fail(self):
        rng = np.random.default_rng(4)
        pts_a, tex_a = make_world(rng)
        pts_b, tex_b = make_world(np.random.default_rng(99))
        img_a, dep_a = render(pts_a, tex_a, np.eye(4))
        img_b, dep_b = render(pts_b, tex_b, np.eye(4))
        kp_a, _ = native.fast_detect(img_a, 25, 300)
        kp_b, _ = native.fast_detect(img_b, 25, 300)
        Z, success, inliers = vreg.verify_keyframe_pair(
            vreg.project_to_3d(kp_a, dep_a, CAM.fx, CAM.fy, CAM.cx, CAM.cy),
            native.brief_describe(img_a, kp_a),
            vreg.project_to_3d(kp_b, dep_b, CAM.fx, CAM.fy, CAM.cx, CAM.cy),
            native.brief_describe(img_b, kp_b),
            min_inliers=20, inlier_dist=0.3)
        assert not success


class TestStereo:

    def test_stereo_depth_accuracy(self):
        rng = np.random.default_rng(5)
        pts, tex = make_world(rng, n=60)
        left = render(pts, tex, np.eye(4), depth_too=False)
        right_pose = pose_xyz_yaw(CAM.baseline, 0, 0)  # camera shifted +x
        right = render(pts, tex, right_pose, depth_too=False)

        bus, clock = MessageBus(), VirtualClock()
        ctx = RobotContext(bus, clock, 0, {"robot_id": 0, "max_nb_robots": 2})
        fe = StereoFrontEnd(ctx, CAM)
        feats = fe._compute_local_features(left, right)
        have_depth = feats.keypoints3d[:, 2] > 0
        assert have_depth.sum() > 15
        # depths must be in the landmark range and consistent with gt z
        z = feats.keypoints3d[have_depth, 2]
        assert np.all(z > 2.0) and np.all(z < 13.0)


class TestSteeredBrief:
    """ORB-style steered BRIEF: in-plane-rotation robustness
    (round-1 VERDICT item 6; rtabmap Feature2D role,
    reference rgbd_handler.cpp:266-312)."""

    @staticmethod
    def _rotate(img, deg):
        from scipy import ndimage
        return ndimage.rotate(img.astype(np.float32), deg, reshape=False,
                              order=1, mode="constant").astype(np.uint8)

    @staticmethod
    def _correct_matches(kp_a, kp_b, pairs, deg, shape, tol=3.0):
        """Count matches consistent with the known image rotation."""
        cy, cx = (shape[0] - 1) / 2.0, (shape[1] - 1) / 2.0
        # scipy.ndimage.rotate(deg) maps output<-input with a rotation of
        # -deg; a point p in the original lands at R(-deg) (p - c) + c
        th = np.deg2rad(-deg)
        R = np.array([[np.cos(th), -np.sin(th)],
                      [np.sin(th), np.cos(th)]])
        good = 0
        for i, j in pairs:
            pa = kp_a[i].astype(np.float64) - [cx, cy]
            expected = R @ pa + [cx, cy]
            if np.linalg.norm(expected - kp_b[j]) < tol:
                good += 1
        return good

    def test_native_matches_fallback(self):
        from cslam_tpu import native
        from cslam_tpu.native import fallback
        rng = np.random.default_rng(3)
        pts, tex = make_world(rng, n=80)
        img, _ = render(pts, tex, np.eye(4))
        kp, _ = native.fast_detect(img, 20, 128)
        d_n, a_n = native.steered_brief_describe(img, kp)
        d_f, a_f = fallback.steered_brief_describe(img, kp)
        assert np.array_equal(d_n, d_f)
        np.testing.assert_allclose(a_n, a_f, atol=1e-6)

    @pytest.mark.parametrize("deg", [30, 60, 90])
    def test_rotation_sweep(self, deg):
        """Steered BRIEF must keep matching under in-plane rotation where
        unsteered BRIEF collapses."""
        from cslam_tpu import native
        rng = np.random.default_rng(17)
        pts, tex = make_world(rng, n=120)
        img, _ = render(pts, tex, np.eye(4))
        rot = self._rotate(img, deg)

        kp_a, _ = native.fast_detect(img, 20, 256)
        kp_b, _ = native.fast_detect(rot, 20, 256)
        assert len(kp_a) > 30 and len(kp_b) > 30

        # steered
        da, _ = native.steered_brief_describe(img, kp_a)
        db, _ = native.steered_brief_describe(rot, kp_b)
        pairs_s = native.hamming_match(da, db, max_dist=50)
        good_s = self._correct_matches(kp_a, kp_b, pairs_s, deg, img.shape)

        # unsteered
        ua = native.brief_describe(img, kp_a)
        ub = native.brief_describe(rot, kp_b)
        pairs_u = native.hamming_match(ua, ub, max_dist=50)
        good_u = self._correct_matches(kp_a, kp_b, pairs_u, deg, img.shape)

        assert good_s >= 10, f"steered only {good_s} at {deg} deg"
        assert good_s > 2 * good_u, (
            f"steered {good_s} vs unsteered {good_u} at {deg} deg")


class TestPerspectiveRealism:
    """Perspective-warped textured quads (not axis-aligned stamps): each
    landmark is a tilted 3D plane whose texture reaches the image through
    the true plane-induced homography, with per-view lighting changes and
    camera roll. Asserts the full feature -> steered-BRIEF match -> GNC
    verification chain survives 15-30 deg in-plane rotation + perspective
    + lighting (round-3 VERDICT item 6; the reference leans on production
    rtabmap features here, rgbd_handler.cpp:266-312)."""

    TEX = 16          # texels per quad side
    QUAD = 0.55       # quad half-size in meters

    @classmethod
    def _make_quads(cls, rng, n=90):
        centers = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                            rng.uniform(4.5, 9, n)], axis=1)
        # unit normals tilted up to ~35 deg away from facing the camera
        tilt = rng.uniform(0, np.deg2rad(35), n)
        az = rng.uniform(0, 2 * np.pi, n)
        normals = np.stack([np.sin(tilt) * np.cos(az),
                            np.sin(tilt) * np.sin(az),
                            -np.cos(tilt)], axis=1)
        textures = rng.integers(20, 255, (n, cls.TEX, cls.TEX)).astype(
            np.float64)
        return centers, normals, textures

    @classmethod
    def _render(cls, quads, pose, gain=1.0, bias=0.0):
        """Homography-correct render with z-buffer; returns (img, depth)."""
        centers, normals, textures = quads
        img = np.full((H, W), 12, np.float64)
        zbuf = np.full((H, W), np.inf)
        depth = np.zeros((H, W), np.float32)
        K = np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1.0]])
        inv = np.linalg.inv(pose)
        Rc, tc = inv[:3, :3], inv[:3, 3]
        t_max = cls.TEX - 1
        for c, nrm, tex in zip(centers, normals, textures):
            # in-plane axes of the quad
            u_ax = np.cross(nrm, [0.0, 1.0, 0.0])
            u_ax /= np.linalg.norm(u_ax)
            v_ax = np.cross(nrm, u_ax)
            origin = c - cls.QUAD * u_ax - cls.QUAD * v_ax
            step = 2 * cls.QUAD / t_max
            # texture (s,t) -> camera: P = origin + s*step*u + t*step*v
            M = np.stack([Rc @ u_ax * step, Rc @ v_ax * step,
                          Rc @ origin + tc], axis=1)
            Hmat = K @ M
            corners_c = (np.array([[0, 0], [t_max, 0], [t_max, t_max],
                                   [0, t_max]], np.float64)
                         @ M[:, :2].T) + M[:, 2]
            if np.any(corners_c[:, 2] < 0.5):
                continue
            uv = corners_c[:, :2] * (np.array([CAM.fx, CAM.fy])
                                     / corners_c[:, 2:3]) \
                + np.array([CAM.cx, CAM.cy])
            u0, v0 = np.floor(uv.min(axis=0)).astype(int) - 1
            u1, v1 = np.ceil(uv.max(axis=0)).astype(int) + 1
            u0, v0 = max(u0, 0), max(v0, 0)
            u1, v1 = min(u1, W - 1), min(v1, H - 1)
            if u1 <= u0 or v1 <= v0:
                continue
            gu, gv = np.meshgrid(np.arange(u0, u1 + 1),
                                 np.arange(v0, v1 + 1))
            pix = np.stack([gu.ravel(), gv.ravel(),
                            np.ones(gu.size)], axis=0)
            st = np.linalg.inv(Hmat) @ pix
            with np.errstate(divide="ignore", invalid="ignore"):
                s = st[0] / st[2]
                t = st[1] / st[2]
            inside = ((st[2] > 0) & (s >= 0) & (s <= t_max)
                      & (t >= 0) & (t <= t_max))
            if not inside.any():
                continue
            s, t = s[inside], t[inside]
            uu, vv = gu.ravel()[inside], gv.ravel()[inside]
            z = M[2, 0] * s + M[2, 1] * t + M[2, 2]
            s0 = np.clip(s.astype(int), 0, t_max - 1)
            t0 = np.clip(t.astype(int), 0, t_max - 1)
            fs, ft = s - s0, t - t0
            val = (tex[t0, s0] * (1 - fs) * (1 - ft)
                   + tex[t0, s0 + 1] * fs * (1 - ft)
                   + tex[t0 + 1, s0] * (1 - fs) * ft
                   + tex[t0 + 1, s0 + 1] * fs * ft)
            closer = z < zbuf[vv, uu]
            vv, uu = vv[closer], uu[closer]
            zbuf[vv, uu] = z[closer]
            img[vv, uu] = val[closer]
            depth[vv, uu] = z[closer]
        img = np.clip(gain * img + bias, 0, 255).astype(np.uint8)
        return img, depth

    @staticmethod
    def _pose_roll(x, y, z, roll_deg):
        """Camera at (x,y,z) looking along +z, rolled about the optical
        axis by roll_deg."""
        r = np.deg2rad(roll_deg)
        T = np.eye(4)
        T[:3, :3] = [[np.cos(r), -np.sin(r), 0],
                     [np.sin(r), np.cos(r), 0], [0, 0, 1.0]]
        T[:3, 3] = [x, y, z]
        return T

    def _features(self, img, dep):
        kp, _ = native.fast_detect(img, 18, 400)
        desc, _ = native.steered_brief_describe(img, kp)
        p3d = vreg.project_to_3d(kp, dep, CAM.fx, CAM.fy, CAM.cx, CAM.cy)
        return p3d, desc

    @pytest.mark.parametrize("roll", [15, 30])
    def test_verification_survives_roll_and_perspective(self, roll):
        rng = np.random.default_rng(21)
        quads = self._make_quads(rng)
        Xa = self._pose_roll(0, 0, 0, 0)
        Xb = self._pose_roll(0.35, -0.2, 0.3, roll)
        img_a, dep_a = self._render(quads, Xa)
        img_b, dep_b = self._render(quads, Xb, gain=1.15, bias=-8.0)
        pa, da = self._features(img_a, dep_a)
        pb, db = self._features(img_b, dep_b)
        assert len(pa) > 60 and len(pb) > 60
        Z, success, inliers = vreg.verify_keyframe_pair(
            pa, da, pb, db, min_inliers=8, inlier_dist=0.35)
        assert success, f"verification failed at roll {roll}"
        assert inliers >= 12
        Z_gt = np.linalg.inv(Xa) @ Xb
        np.testing.assert_allclose(Z[:3, 3], Z_gt[:3, 3], atol=0.15)
        # rotation error under ~5 deg
        dR = Z[:3, :3].T @ Z_gt[:3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 5.0

    def test_steered_beats_unsteered_at_30deg(self):
        """At 30 deg roll the steered descriptors must keep several times
        more geometrically-consistent matches than unsteered BRIEF."""
        rng = np.random.default_rng(22)
        quads = self._make_quads(rng)
        Xa = self._pose_roll(0, 0, 0, 0)
        Xb = self._pose_roll(0.15, 0.1, 0.0, 30)
        img_a, dep_a = self._render(quads, Xa)
        img_b, dep_b = self._render(quads, Xb)
        kp_a, _ = native.fast_detect(img_a, 18, 400)
        kp_b, _ = native.fast_detect(img_b, 18, 400)

        def inlier_count(desc_a, desc_b):
            pairs = native.hamming_match(desc_a, desc_b, max_dist=55)
            if len(pairs) < 5:
                return 0
            pa = vreg.project_to_3d(kp_a, dep_a, CAM.fx, CAM.fy,
                                    CAM.cx, CAM.cy)
            pb = vreg.project_to_3d(kp_b, dep_b, CAM.fx, CAM.fy,
                                    CAM.cx, CAM.cy)
            Z_gt = np.linalg.inv(Xa) @ Xb
            good = 0
            for i, j in pairs:
                if pa[i][2] <= 0 or pb[j][2] <= 0:
                    continue
                mapped = Z_gt[:3, :3] @ pb[j] + Z_gt[:3, 3]
                if np.linalg.norm(mapped - pa[i]) < 0.3:
                    good += 1
            return good

        good_steered = inlier_count(
            native.steered_brief_describe(img_a, kp_a)[0],
            native.steered_brief_describe(img_b, kp_b)[0])
        good_plain = inlier_count(native.brief_describe(img_a, kp_a),
                                  native.brief_describe(img_b, kp_b))
        assert good_steered >= 10
        assert good_steered >= 2 * max(good_plain, 1), (
            f"steered {good_steered} vs plain {good_plain}")

    def test_lighting_only_change_is_not_a_new_keyframe(self):
        """Same view under different lighting must re-identify (the
        keyframe inlier-ratio gate depends on it)."""
        rng = np.random.default_rng(23)
        quads = self._make_quads(rng)
        X = self._pose_roll(0, 0, 0, 0)
        img_a, dep_a = self._render(quads, X)
        img_b, dep_b = self._render(quads, X, gain=0.75, bias=12.0)
        pa, da = self._features(img_a, dep_a)
        pb, db = self._features(img_b, dep_b)
        Z, success, inliers = vreg.verify_keyframe_pair(
            pa, da, pb, db, min_inliers=10, inlier_dist=0.25)
        assert success and inliers > 20
        np.testing.assert_allclose(Z[:3, 3], np.zeros(3), atol=0.05)


class TestStereoCameraModel:
    """Reference stereo_handler.cpp:119-205 parity: rectified-pair model
    construction from camera infos, baseline sanity, fallback path."""

    def _infos(self, tx):
        from cslam_tpu.runtime.rgbd_frontend import CameraInfo
        left = CameraInfo(fx=CAM.fx, fy=CAM.fy, cx=CAM.cx, cy=CAM.cy)
        right = CameraInfo(fx=CAM.fx, fy=CAM.fy, cx=CAM.cx, cy=CAM.cy,
                           tx=tx)
        return left, right

    def test_baseline_from_right_tx(self):
        from cslam_tpu.runtime.rgbd_frontend import StereoCameraModel
        left, right = self._infos(tx=-CAM.fx * 0.12)
        model = StereoCameraModel.from_camera_infos(left, right)
        assert model.baseline == pytest.approx(0.12)
        cm = model.as_camera_model()
        assert (cm.fx, cm.baseline) == (CAM.fx, pytest.approx(0.12))

    def test_nonpositive_baseline_rejected(self):
        from cslam_tpu.runtime.rgbd_frontend import (StereoBaselineError,
                                                     StereoCameraModel)
        left, right = self._infos(tx=CAM.fx * 0.12)  # positive Tx = invalid
        with pytest.raises(StereoBaselineError):
            StereoCameraModel.from_camera_infos(left, right)
        left, right = self._infos(tx=0.0)  # missing Tx, no fallback
        with pytest.raises(StereoBaselineError):
            StereoCameraModel.from_camera_infos(left, right)

    def test_missing_tx_fallback_baseline(self):
        """The reference's TF-derived baseline convenience path
        (stereo_handler.cpp:152-182)."""
        from cslam_tpu.runtime.rgbd_frontend import StereoCameraModel
        left, right = self._infos(tx=0.0)
        model = StereoCameraModel.from_camera_infos(
            left, right, fallback_baseline=0.2)
        assert model.baseline == pytest.approx(0.2)

    def test_large_baseline_warns_once(self, caplog):
        from cslam_tpu.runtime.rgbd_frontend import StereoCameraModel
        StereoCameraModel._warned_large = False
        left, right = self._infos(tx=-CAM.fx * 25.0)
        import logging as _logging
        with caplog.at_level(_logging.WARNING,
                             logger="cslam_tpu.runtime.rgbd_frontend"):
            m = StereoCameraModel.from_camera_infos(left, right)
            StereoCameraModel.from_camera_infos(left, right)
        assert m.baseline == pytest.approx(25.0)  # accepted, but flagged
        assert sum("plausibility bound" in r.message
                   for r in caplog.records) == 1

    def test_disparity_to_depth(self):
        from cslam_tpu.runtime.rgbd_frontend import StereoCameraModel
        left, right = self._infos(tx=-CAM.fx * 0.12)
        model = StereoCameraModel.from_camera_infos(left, right)
        d = np.array([CAM.fx * 0.12 / 4.0, 0.0, -2.0])
        z = model.disparity_to_depth(d)
        assert z[0] == pytest.approx(4.0, rel=1e-5)
        assert z[1] == 0.0 and z[2] == 0.0

    def test_invalid_model_drops_frame(self):
        """Per-frame camera infos with a broken right Tx must drop the
        frame like the reference's early return (cpp:185-194)."""
        from cslam_tpu.runtime.rgbd_frontend import StereoFrontEnd
        bus, clock = MessageBus(), VirtualClock()
        ctx = RobotContext(bus, clock, 0, {"robot_id": 0,
                                           "max_nb_robots": 2})
        fe = StereoFrontEnd(ctx, CAM)
        left, right = self._infos(tx=CAM.fx * 0.12)
        img = np.zeros((64, 64), np.uint8)
        fe.stereo_callback(img, img, Odometry(pose=np.eye(4)),
                           left_info=left, right_info=right)
        assert len(fe.queue) == 0
        assert fe.dropped_invalid_model == 1
        # a valid pair rebuilds the model and enqueues
        left, right = self._infos(tx=-CAM.fx * 0.12)
        fe.stereo_callback(img, img, Odometry(pose=np.eye(4)),
                           left_info=left, right_info=right)
        assert len(fe.queue) == 1
        assert fe.stereo_model.baseline == pytest.approx(0.12)
        assert fe.camera.baseline == pytest.approx(0.12)

    def test_metric_depth_from_camera_infos(self):
        """End-to-end: rendered rectified pair + camera infos -> metric
        sparse depth within tolerance of the rendered ground truth."""
        from cslam_tpu.runtime.rgbd_frontend import (StereoCameraModel,
                                                     StereoFrontEnd)
        rng = np.random.default_rng(11)
        pts, tex = make_world(rng, n=80)
        baseline = CAM.baseline
        left_img = render(pts, tex, np.eye(4), depth_too=False)
        _, gt_depth = render(pts, tex, np.eye(4), depth_too=True)
        right_img = render(pts, tex, pose_xyz_yaw(baseline, 0, 0),
                           depth_too=False)

        from cslam_tpu.runtime.rgbd_frontend import CameraInfo
        left = CameraInfo(fx=CAM.fx, fy=CAM.fy, cx=CAM.cx, cy=CAM.cy)
        right = CameraInfo(fx=CAM.fx, fy=CAM.fy, cx=CAM.cx, cy=CAM.cy,
                           tx=-CAM.fx * baseline)
        model = StereoCameraModel.from_camera_infos(left, right)

        bus, clock = MessageBus(), VirtualClock()
        ctx = RobotContext(bus, clock, 0, {"robot_id": 0,
                                           "max_nb_robots": 2})
        fe = StereoFrontEnd(ctx, model)
        feats = fe._compute_local_features(left_img, right_img)
        have = feats.keypoints3d[:, 2] > 0
        assert have.sum() > 15
        errs = []
        for (x, y), (X, Y, Z) in zip(feats.keypoints[have],
                                     feats.keypoints3d[have]):
            gt_z = gt_depth[int(y), int(x)]
            if gt_z > 0:
                errs.append(abs(Z - gt_z) / gt_z)
        assert len(errs) > 10
        # sub-5% median metric depth error against the rendered scene
        assert np.median(errs) < 0.05


class TestRGBDHandlerFlow:

    def test_inter_robot_verification_over_bus(self):
        """Two RGB-D handlers exchange descriptors over the bus; the
        resulting loop closure matches the ground-truth relative pose."""
        rng = np.random.default_rng(6)
        pts, tex = make_world(rng)
        bus, clock = MessageBus(), VirtualClock()
        params = {"robot_id": 0, "max_nb_robots": 2,
                  "frontend.map_manager_process_period_ms": 100}
        ctx0 = RobotContext(bus, clock, 0, dict(params))
        ctx1 = RobotContext(bus, clock, 1, dict(params, robot_id=1))
        fe0 = RGBDFrontEnd(ctx0, CAM)
        fe1 = RGBDFrontEnd(ctx1, CAM)

        X0 = pose_xyz_yaw(0, 0, 0)
        X1 = pose_xyz_yaw(0.3, -0.2, 0.0, yaw=0.08)
        img0, dep0 = render(pts, tex, X0)
        img1, dep1 = render(pts, tex, X1)
        fe0.rgbd_callback(img0, dep0, Odometry(pose=X0))
        fe1.rgbd_callback(img1, dep1, Odometry(pose=X1))
        clock.advance(0.2)
        ctx0.poll_timers()
        ctx1.poll_timers()
        bus.deliver()
        assert fe0.nb_local_keyframes == 1
        assert fe1.nb_local_keyframes == 1

        closures = []
        bus.subscribe("/cslam/inter_robot_loop_closure", closures.append)
        # robot 1 is asked to ship kf 0's descriptors to robot 0's kf 0
        bus.publish("/r1/cslam/local_descriptors_request",
                    LocalDescriptorsRequest(keyframe_id=0,
                                            matches_robot_id=[0],
                                            matches_keyframe_id=[0]))
        bus.deliver()
        assert len(closures) == 1
        lc = closures[0]
        assert lc.success
        assert (lc.robot0_id, lc.robot1_id) == (0, 1)
        Z_gt = np.linalg.inv(X0) @ X1
        np.testing.assert_allclose(lc.transform[:3, 3], Z_gt[:3, 3],
                                   atol=0.12)

    def test_multi_match_message_batched_verification(self):
        """One incoming descriptor message matching several local keyframes
        must yield one loop closure per match (verified in a single batched
        gnc_align_batch dispatch)."""
        rng = np.random.default_rng(8)
        pts, tex = make_world(rng)
        bus, clock = MessageBus(), VirtualClock()
        params = {"robot_id": 0, "max_nb_robots": 2,
                  "frontend.map_manager_process_period_ms": 100}
        ctx0 = RobotContext(bus, clock, 0, dict(params))
        ctx1 = RobotContext(bus, clock, 1, dict(params, robot_id=1))
        fe0 = RGBDFrontEnd(ctx0, CAM)
        fe1 = RGBDFrontEnd(ctx1, CAM)

        poses0 = [pose_xyz_yaw(0, 0, 0),
                  pose_xyz_yaw(0.4, 0.2, 0, yaw=0.1)]
        for X in poses0:  # robot 0 builds two keyframes
            img, dep = render(pts, tex, X)
            fe0.rgbd_callback(img, dep, Odometry(pose=X))
            clock.advance(0.2)
            ctx0.poll_timers()
        X1 = pose_xyz_yaw(0.2, -0.1, 0.0, yaw=0.05)
        img1, dep1 = render(pts, tex, X1)
        fe1.rgbd_callback(img1, dep1, Odometry(pose=X1))
        clock.advance(0.2)
        ctx1.poll_timers()
        bus.deliver()
        assert fe0.nb_local_keyframes == 2 and fe1.nb_local_keyframes == 1

        closures = []
        bus.subscribe("/cslam/inter_robot_loop_closure", closures.append)
        bus.publish("/r1/cslam/local_descriptors_request",
                    LocalDescriptorsRequest(keyframe_id=0,
                                            matches_robot_id=[0, 0],
                                            matches_keyframe_id=[0, 1]))
        bus.deliver()
        assert len(closures) == 2
        for lc, X0 in zip(sorted(closures,
                                 key=lambda c: c.robot0_keyframe_id), poses0):
            assert lc.success
            Z_gt = np.linalg.inv(X0) @ X1
            np.testing.assert_allclose(lc.transform[:3, 3], Z_gt[:3, 3],
                                       atol=0.12)

    def test_keyframe_gating_by_inlier_ratio(self):
        rng = np.random.default_rng(7)
        pts, tex = make_world(rng)
        bus, clock = MessageBus(), VirtualClock()
        ctx = RobotContext(bus, clock, 0, {
            "robot_id": 0, "max_nb_robots": 2,
            "frontend.map_manager_process_period_ms": 100,
            "frontend.keyframe_generation_ratio_threshold": 0.5})
        fe = RGBDFrontEnd(ctx, CAM)
        img, dep = render(pts, tex, np.eye(4))
        # same frame twice: second one should NOT become a keyframe
        for _ in range(2):
            fe.rgbd_callback(img, dep, Odometry(pose=np.eye(4)))
            clock.advance(0.2)
            ctx.poll_timers()
        assert fe.nb_local_keyframes == 1
        # a very different viewpoint becomes a keyframe again
        img2, dep2 = render(pts, tex, pose_xyz_yaw(3.0, 1.5, 0, yaw=0.6))
        fe.rgbd_callback(img2, dep2, Odometry(pose=np.eye(4)))
        clock.advance(0.2)
        ctx.poll_timers()
        assert fe.nb_local_keyframes == 2


class TestVizPublishing:
    """Per-keyframe viz clouds (reference rgbd_handler.cpp:613-682)."""

    def test_rgbd_keyframe_publishes_colored_cloud(self):
        rng = np.random.default_rng(11)
        pts, tex = make_world(rng)
        bus, clock = MessageBus(), VirtualClock()
        ctx = RobotContext(bus, clock, 0, {
            "robot_id": 0, "max_nb_robots": 2,
            "frontend.map_manager_process_period_ms": 100,
            "visualization.enable": True, "visualization.stride": 2})
        fe = RGBDFrontEnd(ctx, CAM)
        viz = []
        bus.subscribe("/cslam/viz/keyframe_pointcloud", viz.append)
        img, dep = render(pts, tex, np.eye(4))
        fe.rgbd_callback(img, dep, Odometry(pose=np.eye(4)))
        clock.advance(0.2)
        ctx.poll_timers()
        bus.deliver()
        assert len(viz) == 1
        msg = viz[0]
        assert (msg.robot_id, msg.keyframe_id) == (0, 0)
        cloud = msg.points
        assert cloud.ndim == 2 and cloud.shape[1] == 6
        # every strided valid depth pixel back-projects into the cloud
        assert cloud.shape[0] == int((dep[::2, ::2] > 0).sum())
        # back-projection consistency: z column equals the depth samples
        zs = np.sort(cloud[:, 2])
        ref = np.sort(dep[::2, ::2][dep[::2, ::2] > 0])
        np.testing.assert_allclose(zs, ref, atol=1e-5)

    def test_viz_disabled_publishes_nothing(self):
        rng = np.random.default_rng(11)
        pts, tex = make_world(rng)
        bus, clock = MessageBus(), VirtualClock()
        ctx = RobotContext(bus, clock, 0, {
            "robot_id": 0, "max_nb_robots": 2,
            "frontend.map_manager_process_period_ms": 100})
        fe = RGBDFrontEnd(ctx, CAM)
        viz = []
        bus.subscribe("/cslam/viz/keyframe_pointcloud", viz.append)
        img, dep = render(pts, tex, np.eye(4))
        fe.rgbd_callback(img, dep, Odometry(pose=np.eye(4)))
        clock.advance(0.2)
        ctx.poll_timers()
        bus.deliver()
        assert fe.nb_local_keyframes == 1 and not viz

    def test_stereo_keyframe_publishes_sparse_cloud(self):
        rng = np.random.default_rng(5)
        pts, tex = make_world(rng, n=60)
        left = render(pts, tex, np.eye(4), depth_too=False)
        right = render(pts, tex, pose_xyz_yaw(CAM.baseline, 0, 0),
                       depth_too=False)
        bus, clock = MessageBus(), VirtualClock()
        ctx = RobotContext(bus, clock, 0, {
            "robot_id": 0, "max_nb_robots": 2,
            "frontend.map_manager_process_period_ms": 100,
            "visualization.enable": True})
        fe = StereoFrontEnd(ctx, CAM)
        viz = []
        bus.subscribe("/cslam/viz/keyframe_pointcloud", viz.append)
        fe.stereo_callback(left, right, Odometry(pose=np.eye(4)))
        clock.advance(0.2)
        ctx.poll_timers()
        bus.deliver()
        assert len(viz) == 1
        cloud = viz[0].points
        assert cloud.shape[1] == 6 and cloud.shape[0] > 15
        assert np.all(cloud[:, 2] > 0)  # only triangulated points


class TestPayloadCompression:
    """The descriptor-exchange plane ships deflate-compressed payloads
    (frontend.compress_payloads, default on) — the reference never ships
    raw feature arrays either (rgbd_handler.cpp:404-431)."""

    def _one_robot_with_keyframe(self, params_extra=None):
        rng = np.random.default_rng(9)
        pts, tex = make_world(rng)
        bus, clock = MessageBus(), VirtualClock()
        params = {"robot_id": 1, "max_nb_robots": 2,
                  "frontend.map_manager_process_period_ms": 100,
                  "evaluation.enable_logs": True}
        params.update(params_extra or {})
        ctx = RobotContext(bus, clock, 1, params)
        fe = RGBDFrontEnd(ctx, CAM)
        img, dep = render(pts, tex, pose_xyz_yaw(0, 0, 0))
        fe.rgbd_callback(img, dep, Odometry(pose=pose_xyz_yaw(0, 0, 0)))
        clock.advance(0.2)
        ctx.poll_timers()
        bus.deliver()
        assert fe.nb_local_keyframes == 1
        return bus, fe

    def test_wire_payload_is_compressed_bytes(self):
        bus, fe = self._one_robot_with_keyframe()
        sent = []
        bus.subscribe("/cslam/local_descriptors", sent.append)
        logs = []
        bus.subscribe("/r1/cslam/log_info", logs.append)
        bus.publish("/r1/cslam/local_descriptors_request",
                    LocalDescriptorsRequest(keyframe_id=0,
                                            matches_robot_id=[0],
                                            matches_keyframe_id=[0]))
        bus.deliver()
        assert len(sent) == 1
        msg = sent[0]
        assert isinstance(msg.descriptors, bytes)
        assert isinstance(msg.keypoints3d, bytes)
        # accounting uses the actual compressed descriptor bytes
        comm = [kv for kv in logs
                if kv.key == "local_descriptors_cumulative_communication"]
        assert comm and int(comm[-1].value) > 0
        feats = fe.features[0]
        from cslam_tpu.utils import compression as C
        np.testing.assert_array_equal(
            C.decompress_array(msg.descriptors), feats.descriptors)
        np.testing.assert_array_equal(
            C.decompress_array(msg.keypoints3d), feats.keypoints3d)

    def test_receiver_accepts_uncompressed_peer(self):
        """A peer with compression off must interoperate (rolling
        upgrades / mixed fleets)."""
        bus, fe = self._one_robot_with_keyframe(
            {"frontend.compress_payloads": False})
        sent = []
        bus.subscribe("/cslam/local_descriptors", sent.append)
        bus.publish("/r1/cslam/local_descriptors_request",
                    LocalDescriptorsRequest(keyframe_id=0,
                                            matches_robot_id=[0],
                                            matches_keyframe_id=[0]))
        bus.deliver()
        assert len(sent) == 1
        assert isinstance(sent[0].descriptors, np.ndarray)
        # feed the raw message into a compressing receiver: must not choke
        fe.receive_local_image_descriptors(sent[0])


class TestProjectiveVerification:
    """GNC-TLS PnP (frontend.verification_residual == 'projective'): the
    reference's reprojection-error decision surface
    (rgbd_handler.cpp:493-554) — verify convention, outlier robustness,
    and the degraded-local-depth case where 3D-3D alignment biases."""

    def _synthetic_pair(self, seed, n=220, outlier_frac=0.2,
                        depth_noise=0.0):
        """Known relative pose; returns the projective-verify inputs and
        ground truth Z = X_a^-1 X_b.

        Points live in b's camera frame; a observes their projections.
        a's own back-projections (init input) get multiplicative depth
        noise to model coarse stereo depth.
        """
        rng = np.random.default_rng(seed)
        Z = pose_xyz_yaw(0.5, 0.3, 0.1, yaw=0.15)  # = X_a^-1 X_b
        p_b = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                        rng.uniform(3, 12, n)], axis=1).astype(np.float32)
        p_a = (p_b @ Z[:3, :3].T + Z[:3, 3]).astype(np.float32)
        uv = np.stack([CAM.fx * p_a[:, 0] / p_a[:, 2] + CAM.cx,
                       CAM.fy * p_a[:, 1] / p_a[:, 2] + CAM.cy],
                      axis=1).astype(np.float32)
        uv += rng.normal(scale=0.3, size=uv.shape).astype(np.float32)
        n_out = int(outlier_frac * n)
        out_idx = rng.choice(n, n_out, replace=False)
        uv[out_idx] += rng.uniform(40, 200, (n_out, 2)).astype(np.float32)
        a3 = p_a.copy()
        if depth_noise:
            a3 *= (1.0 + rng.normal(scale=depth_noise, size=(n, 1))
                   ).astype(np.float32)
        valid = np.ones(n, np.float32)
        return Z, p_b, uv, a3, valid, out_idx

    def _pad(self, arr, rows):
        out = np.zeros((rows,) + arr.shape[1:], arr.dtype)
        out[:len(arr)] = arr
        return out

    def test_pnp_convention_and_outliers(self):
        Z, p_b, uv, a3, valid, out_idx = self._synthetic_pair(0)
        N = vreg.MAX_CORRESPONDENCES
        T, inl = vreg.gnc_pnp_batch(
            self._pad(p_b, N)[None], self._pad(uv, N)[None],
            self._pad(valid, N)[None], self._pad(a3, N)[None],
            np.float32(CAM.fx), np.float32(CAM.fy),
            np.float32(CAM.cx), np.float32(CAM.cy))
        T = np.asarray(T)[0]
        np.testing.assert_allclose(T[:3, 3], Z[:3, 3], atol=0.03)
        np.testing.assert_allclose(T[:3, :3], Z[:3, :3], atol=0.02)
        # inliers ~ the clean correspondences
        assert int(inl[0]) > 0.9 * (len(p_b) - len(out_idx))

    def test_projective_beats_3d3d_under_degraded_depth(self):
        """With 25% multiplicative local-depth noise the 3D-3D estimate
        biases (depth errors enter the residual); the projective estimate
        must stay metric because local depth only seeds the init."""
        Z, p_b, uv, a3, valid, _ = self._synthetic_pair(
            1, outlier_frac=0.1, depth_noise=0.25)
        N = vreg.MAX_CORRESPONDENCES
        T_pnp, _ = vreg.gnc_pnp_batch(
            self._pad(p_b, N)[None], self._pad(uv, N)[None],
            self._pad(valid, N)[None], self._pad(a3, N)[None],
            np.float32(CAM.fx), np.float32(CAM.fy),
            np.float32(CAM.cx), np.float32(CAM.cy))
        err_pnp = np.linalg.norm(np.asarray(T_pnp)[0][:3, 3] - Z[:3, 3])
        # 3D-3D on the SAME noisy local points (src=p_b -> dst=a3; its
        # returned point map inverse equals Z's convention already
        # via verify path; here compare the raw alignment error)
        T3, _ = vreg.gnc_align(self._pad(p_b, N), self._pad(a3, N),
                               self._pad(valid, N), 0.3)
        err_3d = np.linalg.norm(np.asarray(T3)[:3, 3] - Z[:3, 3])
        assert err_pnp < 0.05, err_pnp
        assert err_pnp < 0.5 * err_3d, (err_pnp, err_3d)

    def test_missing_local_depth_still_verifies(self):
        """Zero local depth everywhere (no init seed): identity init + GN
        must still converge for a small relative pose."""
        Z, p_b, uv, a3, valid, out_idx = self._synthetic_pair(
            2, outlier_frac=0.1)
        a3[:] = 0.0
        N = vreg.MAX_CORRESPONDENCES
        T, inl = vreg.gnc_pnp_batch(
            self._pad(p_b, N)[None], self._pad(uv, N)[None],
            self._pad(valid, N)[None], self._pad(a3, N)[None],
            np.float32(CAM.fx), np.float32(CAM.fy),
            np.float32(CAM.cx), np.float32(CAM.cy))
        T = np.asarray(T)[0]
        np.testing.assert_allclose(T[:3, 3], Z[:3, 3], atol=0.05)

    def test_projective_flow_over_bus(self):
        """The RGBDFrontEnd wired with verification_residual='projective'
        must verify rendered keyframes end-to-end (the product surface of
        the new residual) with the BetweenFactor convention."""
        rng = np.random.default_rng(3)
        pts, tex = make_world(rng)
        bus, clock = MessageBus(), VirtualClock()
        params = {"robot_id": 0, "max_nb_robots": 2,
                  "frontend.verification_residual": "projective",
                  "frontend.pnp_min_inliers": 8}
        fes = [RGBDFrontEnd(RobotContext(bus, clock, rid,
                                         dict(params, robot_id=rid)), CAM)
               for rid in (0, 1)]
        Xa = pose_xyz_yaw(0, 0, 0)
        Xb = pose_xyz_yaw(0.4, 0.2, 0.0, yaw=0.1)
        for fe, X in zip(fes, (Xa, Xb)):
            img, dep = render(pts, tex, X)
            fe.rgbd_callback(img, dep, Odometry(pose=X))
        clock.advance(0.2)
        for fe in fes:
            fe.ctx.poll_timers()
        bus.deliver()
        closures = []
        bus.subscribe("/cslam/inter_robot_loop_closure", closures.append)
        bus.publish("/r1/cslam/local_descriptors_request",
                    LocalDescriptorsRequest(keyframe_id=0,
                                            matches_robot_id=[0],
                                            matches_keyframe_id=[0]))
        bus.deliver()
        assert closures and closures[0].success
        Z_gt = np.linalg.inv(Xa) @ Xb
        np.testing.assert_allclose(closures[0].transform[:3, 3],
                                   Z_gt[:3, 3], atol=0.1)
