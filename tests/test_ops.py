"""Unit tests for the core math kernels.

Mirrors the reference test strategy (SURVEY.md §4): round trips, oracle parity
with OpenCV, and derivative checks against finite differences.
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycamset_tpu.ops import (
    rodrigues_to_matrix, matrix_to_rodrigues, pose_to_se3, se3_apply,
    pose_apply, pose_inv, se3_inv, se3_compose, rigid_fit, geometric_median,
    distort_pixels, undistort_pixels, project_cam_points,
    project_target_points, intr9_from_k_dist, triangulate_nviews,
    pairwise_dist,
)

RNG = np.random.default_rng(7)


def rand_rvec(scale=np.pi * 0.8):
    v = RNG.normal(size=3)
    return v / np.linalg.norm(v) * RNG.uniform(0.5 * scale, scale)


class TestRotations:
    def test_matches_opencv(self):
        for _ in range(20):
            r = rand_rvec()
            ours = np.array(rodrigues_to_matrix(jnp.array(r)))
            cv, _ = cv2.Rodrigues(r)
            np.testing.assert_allclose(ours, cv, atol=1e-12)

    def test_zero_angle(self):
        r = np.zeros(3)
        np.testing.assert_allclose(np.array(rodrigues_to_matrix(jnp.array(r))), np.eye(3))

    def test_round_trip(self):
        for scale in [1e-8, 1e-4, 0.5, 2.0, np.pi - 1e-3]:
            r = rand_rvec(scale) if scale < np.pi else rand_rvec()
            m = rodrigues_to_matrix(jnp.array(r))
            r2 = np.array(matrix_to_rodrigues(m))
            np.testing.assert_allclose(r2, r, atol=1e-7)

    def test_near_pi(self):
        axis = np.array([0.3, -0.5, 0.8])
        axis /= np.linalg.norm(axis)
        r = axis * (np.pi - 1e-9)
        m = rodrigues_to_matrix(jnp.array(r))
        r2 = np.array(matrix_to_rodrigues(m))
        m2 = np.array(rodrigues_to_matrix(jnp.array(r2)))
        np.testing.assert_allclose(m2, np.array(m), atol=1e-6)

    def test_jacobian_vs_opencv(self):
        # the reference ports OpenCV's analytic rodrigues jacobian
        # (compiled_helpers.py:237-286); ours comes from jacfwd.
        for _ in range(5):
            r = rand_rvec()
            jac = jax.jacfwd(rodrigues_to_matrix)(jnp.array(r))  # (3,3,3)
            _, cv_jac = cv2.Rodrigues(r)  # (3,9) d(flat R)/d r
            np.testing.assert_allclose(
                np.array(jac).reshape(9, 3), cv_jac.T, atol=1e-9)

    def test_jacobian_at_zero_is_finite(self):
        jac = jax.jacfwd(rodrigues_to_matrix)(jnp.zeros(3))
        assert np.all(np.isfinite(np.array(jac)))
        # d R / d r at 0 is the skew generator
        _, cv_jac = cv2.Rodrigues(np.zeros(3))
        np.testing.assert_allclose(np.array(jac).reshape(9, 3), cv_jac.T, atol=1e-9)


class TestTransforms:
    def test_pose_apply_inverse(self):
        pose = jnp.array(np.concatenate([rand_rvec(), RNG.normal(size=3)]))
        pts = jnp.array(RNG.normal(size=(10, 3)))
        out = pose_apply(pose, pts)
        back = pose_apply(pose_inv(pose), out)
        np.testing.assert_allclose(np.array(back), np.array(pts), atol=1e-10)

    def test_se3_compose(self):
        a = pose_to_se3(jnp.array(np.concatenate([rand_rvec(), RNG.normal(size=3)])))
        b = pose_to_se3(jnp.array(np.concatenate([rand_rvec(), RNG.normal(size=3)])))
        pts = jnp.array(RNG.normal(size=(5, 3)))
        np.testing.assert_allclose(
            np.array(se3_apply(se3_compose(a, b), pts)),
            np.array(se3_apply(a, se3_apply(b, pts))), atol=1e-12)

    def test_rigid_fit(self):
        rmat = np.array(rodrigues_to_matrix(jnp.array(rand_rvec())))
        t = RNG.normal(size=3)
        src = RNG.normal(size=(20, 3))
        dst = src @ rmat.T + t
        rfit, tfit = rigid_fit(jnp.array(src), jnp.array(dst))
        np.testing.assert_allclose(np.array(rfit), rmat, atol=1e-9)
        np.testing.assert_allclose(np.array(tfit), t, atol=1e-9)

    def test_geometric_median(self):
        pts = np.concatenate([RNG.normal(size=(50, 3)) * 0.01,
                              np.array([[100.0, 100, 100]])])
        med = np.array(geometric_median(jnp.array(pts), iters=100))
        assert np.linalg.norm(med) < 1.0  # robust to the outlier

    def test_pairwise(self):
        a = RNG.normal(size=(4, 3))
        d = np.array(pairwise_dist(jnp.array(a), jnp.array(a)))
        np.testing.assert_allclose(np.diag(d), 0, atol=1e-9)
        np.testing.assert_allclose(
            d[0, 1], np.linalg.norm(a[0] - a[1]), atol=1e-12)


class TestDistortion:
    K = np.array([[800.0, 0, 320], [0, 810.0, 240], [0, 0, 1]])
    DIST = np.array([-0.2, 0.05, 1e-3, -2e-3, 0.01])

    def test_distort_matches_opencv_projection(self):
        # distortion applied to an ideal projection must equal cv2.projectPoints
        pts = RNG.normal(size=(30, 3)) * 0.2 + [0, 0, 2.0]
        ideal = (pts / pts[:, 2:3]) @ self.K.T
        ours = np.array(distort_pixels(jnp.array(ideal[:, :2]), jnp.array(self.K),
                                       jnp.array(self.DIST)))
        cv_uv, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), self.K, self.DIST)
        np.testing.assert_allclose(ours, cv_uv[:, 0, :], atol=1e-9)

    def test_undistort_round_trip(self):
        uv = RNG.uniform([0, 0], [640, 480], size=(50, 2))
        d = np.array(distort_pixels(jnp.array(uv), jnp.array(self.K), jnp.array(self.DIST)))
        u = np.array(undistort_pixels(jnp.array(d), jnp.array(self.K),
                                      jnp.array(self.DIST), iters=20))
        np.testing.assert_allclose(u, uv, atol=1e-6)


class TestProjection:
    K = np.array([[900.0, 0, 501.2], [0, 880.0, 479.5], [0, 0, 1]])
    DIST = np.array([-0.1, 0.03, 5e-4, -8e-4, 0.002])

    def test_oracle_parity_with_opencv(self):
        # oracle: cv2.projectPoints, as in tests/bundle_correctness_test.py:102
        intr9 = intr9_from_k_dist(jnp.array(self.K), jnp.array(self.DIST))
        rvec = rand_rvec(0.5)
        tvec = np.array([0.1, -0.2, 1.5])
        pts = RNG.normal(size=(40, 3)) * 0.1
        extr6 = jnp.array(np.concatenate([rvec, tvec]))
        pose6 = jnp.zeros(6)
        ours = np.array(jax.vmap(
            lambda p: project_target_points(intr9, extr6, pose6, p))(jnp.array(pts)))
        cv_uv, _ = cv2.projectPoints(pts, rvec, tvec, self.K, self.DIST)
        assert np.abs(ours - cv_uv[:, 0, :]).mean() < 1e-4

    def test_jacobian_vs_finite_difference(self):
        # parity target: per-block analytic-vs-numeric check, tol 1e-4
        # (abstract_function_blocks.py:750-775)
        intr9 = np.array(intr9_from_k_dist(jnp.array(self.K), jnp.array(self.DIST)))
        extr6 = np.concatenate([rand_rvec(0.4), [0.1, 0.1, 1.2]])
        pose6 = np.concatenate([rand_rvec(0.3), [0.0, -0.1, 0.2]])
        pt = RNG.normal(size=3) * 0.1
        theta = np.concatenate([intr9, extr6, pose6])

        def f(th):
            return project_target_points(th[:9], th[9:15], th[15:21], jnp.array(pt))

        jac = np.array(jax.jacfwd(f)(jnp.array(theta)))
        eps = 1e-7
        for j in range(21):
            tp = theta.copy(); tp[j] += eps
            tm = theta.copy(); tm[j] -= eps
            num = (np.array(f(jnp.array(tp))) - np.array(f(jnp.array(tm)))) / (2 * eps)
            np.testing.assert_allclose(jac[:, j], num, atol=1e-4, rtol=1e-4)


class TestTriangulation:
    def test_two_view_round_trip(self):
        # mirrors tests/coordinate_system_test.py:73-115 at the kernel level
        K = np.array([[1000.0, 0, 500], [0, 1000.0, 500], [0, 0, 1]])
        e0 = np.eye(4)
        e1 = np.eye(4); e1[:3, 3] = [0.5, 0, 0]
        projs = np.stack([(K @ e0[:3, :4]), (K @ e1[:3, :4])])
        pts = RNG.normal(size=(7, 3)) * 0.3 + [0, 0, 3.0]
        for p in pts:
            uvs = []
            for pm in projs:
                xyw = pm @ np.append(p, 1.0)
                uvs.append(xyw[:2] / xyw[2])
            got = np.array(triangulate_nviews(
                jnp.array(projs), jnp.array(uvs), jnp.ones(2)))
            np.testing.assert_allclose(got, p, atol=1e-8)

    def test_padding_is_exact(self):
        K = np.array([[1000.0, 0, 500], [0, 1000.0, 500], [0, 0, 1]])
        es = []
        for i in range(3):
            e = np.eye(4); e[:3, 3] = [0.3 * i, 0.1 * i, 0]
            es.append(K @ e[:3, :4])
        projs = np.stack(es)
        p = np.array([0.2, -0.1, 2.5])
        uvs = []
        for pm in projs:
            xyw = pm @ np.append(p, 1.0)
            uvs.append(xyw[:2] / xyw[2])
        full = np.array(triangulate_nviews(jnp.array(projs), jnp.array(uvs), jnp.ones(3)))
        # pad with a garbage view, masked out
        projs_p = np.concatenate([projs, projs[:1] * 9.9])
        uvs_p = np.concatenate([uvs, [[1234.0, -999.0]]])
        padded = np.array(triangulate_nviews(
            jnp.array(projs_p), jnp.array(uvs_p), jnp.array([1.0, 1, 1, 0])))
        np.testing.assert_allclose(padded, full, atol=1e-9)


def test_rigid_fit_planar_rank2():
    """Planar point sets make the Kabsch covariance rank-2; the TPU SVD
    returns a DEFECTIVE null-space basis for such inputs (orthogonality
    error ~1), which used to crash every planar-target self-calibration's
    gauge alignment on hardware. rigid_fit now rebuilds the null direction
    via cross products."""
    import jax.numpy as jnp
    import numpy as np
    from pycamset_tpu.ops import rigid_fit
    from pycamset_tpu.utils.general_utils import make_4x4h_tform

    rng = np.random.default_rng(0)
    src = np.concatenate([rng.normal(size=(30, 2)) * 0.05,
                          np.zeros((30, 1))], axis=1)       # z == 0: rank 2
    t_true = make_4x4h_tform(np.array([0.01, -0.02, 0.3]),
                             np.array([0.1, 0.0, 0.05]))
    dst = src @ t_true[:3, :3].T + t_true[:3, 3]
    r, t = rigid_fit(jnp.asarray(src), jnp.asarray(dst))
    r = np.asarray(r)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-10)
    np.testing.assert_allclose(r, t_true[:3, :3], atol=1e-10)
    np.testing.assert_allclose(np.asarray(t), t_true[:3, 3], atol=1e-10)

    # reflection case: planar mirror must still produce a PROPER rotation
    dst_m = dst * np.array([1.0, 1.0, -1.0])
    r2, _ = rigid_fit(jnp.asarray(src), jnp.asarray(dst_m))
    np.testing.assert_allclose(np.linalg.det(np.asarray(r2)), 1.0, atol=1e-8)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
