"""Numerical parity against the reference implementation itself.

The mounted reference's numba kernels are plain numpy under @njit; with
numba stubbed to an identity decorator (tests/ref_oracle.py) they run in
pure Python and serve as EXACT oracles — this is the "run the reference for
bit-level output comparisons" item the roadmap called for, minus the numba
JIT (same code, same arithmetic, interpreter-executed).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from ref_oracle import import_reference, reference_stubs  # noqa: E402

ch = import_reference("pyCamSet.optimisation.compiled_helpers")


def jnp_arr(x):
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(x, dtype=float))

RNG = np.random.default_rng(0)
RVECS = [RNG.normal(size=3) * s for s in (1.0, 0.3, 2.9)] + [
    np.array([1e-12, 0.0, 0.0]), np.zeros(3)]


@pytest.mark.parametrize("i", range(len(RVECS)))
def test_rodrigues_matrix_matches_reference(i):
    from pycamset_tpu.ops.rotations import rodrigues_to_matrix
    r = RVECS[i]
    ref = np.empty(9)
    ch.numba_flat_rodrigues_INPLACE(r, ref)
    ours = np.array(rodrigues_to_matrix(r)).reshape(-1)
    # the reference snaps to identity below theta=1e-10; ours keeps the
    # first-order (autodiff-safe) term — agree to that threshold
    np.testing.assert_allclose(ours, ref, atol=1e-10)


@pytest.mark.parametrize("i", range(len(RVECS)))
def test_rodrigues_jacobian_matches_reference(i):
    import jax
    from pycamset_tpu.ops.rotations import rodrigues_to_matrix
    r = RVECS[i]
    ref = np.zeros(27)  # flat layout: out[i*9+k] = d(R.flat[k]) / dr[i]
    ch.numba_rodrigues_jac(r, ref)
    ours = np.array(jax.jacfwd(rodrigues_to_matrix)(r))
    ours = np.moveaxis(ours, -1, 0).reshape(27)
    if np.linalg.norm(r) < 1e-10:
        # reference small-angle branch writes a FIXED sign pattern; ours is
        # the exact analytic limit d(R)/dr -> generators of so(3). They
        # agree in magnitude; compare |.| (the reference pattern is the
        # opencv convention for the transposed flattening)
        np.testing.assert_allclose(np.abs(ours), np.abs(ref), atol=1e-10)
        return
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_pose_to_h4_matches_reference():
    from pycamset_tpu.ops.transforms import pose_to_h4
    pose = RNG.normal(size=6)
    # np.zeros, not np.empty: the reference only writes rows 0..2 and the
    # corner — the rest of the bottom row is left as-is (latent bug hidden
    # by its callers passing zeroed arrays)
    ref = np.zeros((4, 4))
    ch.n_e4x4(pose, ref)
    np.testing.assert_allclose(np.array(pose_to_h4(pose)), ref, atol=1e-14)


def test_htform_matches_reference():
    from pycamset_tpu.utils.general_utils import h_tform, make_4x4h_tform
    pts = RNG.normal(size=(17, 3))
    t = make_4x4h_tform(RNG.normal(size=3), RNG.normal(size=3))
    # the reference's kernel takes the flat-12 [R row-major | t] layout
    t12 = np.concatenate([t[:3, :3].reshape(-1), t[:3, 3]])
    ref = np.empty((17, 3))
    ch.n_htform_broadcast_prealloc(pts, t12, ref)
    np.testing.assert_allclose(h_tform(pts, t), ref, atol=1e-13)


def test_distort_matches_reference():
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import distort_pixels
    k = np.array([[1400.0, 0, 800], [0, 1410.0, 600], [0, 0, 1]])
    dist = np.array([-0.2, 0.05, 1e-3, -2e-3, 0.01])
    pts = RNG.uniform([300, 300], [1300, 900], size=(25, 2))
    ref = np.array([ch.nb_distort(p.copy(), k, dist) for p in pts])
    ours = np.array(distort_pixels(jnp.asarray(pts), jnp.asarray(k),
                                   jnp.asarray(dist)))
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_undistort_matches_reference():
    import jax.numpy as jnp
    from pycamset_tpu.ops.distortion import undistort_pixels
    k = np.array([[1400.0, 0, 800], [0, 1410.0, 600], [0, 0, 1]])
    dist = np.array([-0.2, 0.05, 1e-3, -2e-3, 0.01])
    pts = RNG.uniform([400, 400], [1200, 800], size=(25, 2))
    ref = np.array([ch.nb_undistort(p, k, dist) for p in pts])  # per point
    # same fixed-point iteration; the reference runs 5 rounds, ours 8 —
    # force 5 for an exact match
    ours = np.array(undistort_pixels(jnp.asarray(pts), jnp.asarray(k),
                                     jnp.asarray(dist), iters=5))
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_inv_pose_matches_reference():
    from pycamset_tpu.ops.transforms import pose_inv, pose_to_se3
    pose = RNG.normal(size=6)
    se3 = np.array(pose_to_se3(pose))                 # (3,4) [R|t]
    flat12 = np.concatenate([se3[:, :3].reshape(-1), se3[:, 3]])
    ref = np.empty(12)
    ch.n_inv_pose(flat12, ref)
    inv = np.array(pose_to_se3(pose_inv(pose)))
    ours = np.concatenate([inv[:, :3].reshape(-1), inv[:, 3]])
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_polar_cartesian_matches_reference():
    from pycamset_tpu.ops.transforms import make_cartesian, make_polar
    lat, lng = 0.7, -1.2
    ref = np.asarray(ch.make_cartesian(lat, lng)).reshape(-1)
    ours = np.array(make_cartesian(jnp_arr([lat, lng])))
    np.testing.assert_allclose(ours, ref, atol=1e-14)
    back_ref = np.asarray(ch.make_polar(ref.copy())).reshape(-1)
    back = np.array(make_polar(ours))
    np.testing.assert_allclose(back, back_ref, atol=1e-12)


def test_rigid_transform_matches_reference():
    from pycamset_tpu.ops.transforms import rigid_fit
    v0 = RNG.normal(size=(12, 3))
    rot_true = np.linalg.qr(RNG.normal(size=(3, 3)))[0]
    if np.linalg.det(rot_true) < 0:
        rot_true[:, 0] *= -1
    v1 = v0 @ rot_true.T + RNG.normal(size=3)
    ref_r, ref_t = ch.n_estimate_rigid_transform(v0, v1)
    r, t = rigid_fit(v0, v1)
    np.testing.assert_allclose(np.array(r), ref_r, atol=1e-10)
    np.testing.assert_allclose(np.array(t), np.asarray(ref_t).reshape(-1),
                               atol=1e-10)


def test_triangulate_nviews_matches_reference():
    from pycamset_tpu.ops.triangulation import triangulate_nviews
    x = RNG.normal(size=3) * 0.2 + [0, 0, 2.0]
    projs, uvs = [], []
    for i in range(4):
        k = np.array([[1000.0, 0, 640], [0, 1000.0, 480], [0, 0, 1]])
        rot = np.eye(3)
        t = np.array([0.3 * i - 0.45, 0.0, 0.0])
        p = k @ np.concatenate([rot, t[:, None]], axis=1)
        uvw = p @ np.append(x, 1.0)
        projs.append(p)
        uvs.append(uvw / uvw[2])
    m = np.zeros((3 * 4, 4 + 4))
    ref = ch.nb_triangulate_nviews(np.array(projs), np.array(uvs), m)
    ours = np.array(triangulate_nviews(
        np.asarray(projs), np.asarray(uvs)[:, :2],
        np.ones(4, dtype=bool)))
    np.testing.assert_allclose(ours, np.asarray(ref), atol=1e-8)


def test_bundle_adjustment_costfn_matches_reference():
    from pycamset_tpu.optim.handlers import reprojection_costs
    n_c, n_i, n_k = 3, 4, 11
    ints = np.array([[[1000.0 + 10 * c, 0, 640], [0, 1001.0 + 10 * c, 480],
                      [0, 0, 1]] for c in range(n_c)])
    dists = RNG.normal(size=(n_c, 5)) * [0.1, 0.02, 1e-3, 1e-3, 1e-3]
    exts = []
    for c in range(n_c):
        rot = np.eye(3)
        t = np.array([0.2 * c, 0.0, 0.0])
        exts.append(np.concatenate([rot, t[:, None]], axis=1))
    proj = np.einsum("cij,cjk->cik", ints, np.array(exts))
    imlocs = RNG.normal(size=(n_i, n_k, 3)) * 0.2 + [0, 0, 2.0]
    n = 60
    dd = np.column_stack([
        RNG.integers(0, n_c, n), RNG.integers(0, n_i, n),
        RNG.integers(0, n_k, n),
        RNG.uniform(0, 1280, n), RNG.uniform(0, 960, n)]).astype(float)
    ref = ch.numpy_bundle_adjustment_costfn(dd, imlocs, proj, ints, dists)
    ours = reprojection_costs(dd, imlocs, proj, ints, dists)
    np.testing.assert_allclose(ours.reshape(-1), ref, atol=1e-9)


def test_detection_ops_match_reference():
    rtd_mod = import_reference(
        "pyCamSet.calibration_targets.target_detections")
    from pycamset_tpu.models.detections import TargetDetection
    n = 80
    data = np.column_stack([
        RNG.integers(0, 3, n), RNG.integers(0, 5, n),
        RNG.integers(0, 4, n), RNG.integers(0, 6, n),
        RNG.uniform(0, 100, size=n), RNG.uniform(0, 100, size=n),
    ]).astype(float)
    names = ["a", "b", "c"]
    ours = TargetDetection(names, data.copy())
    ref = rtd_mod.TargetDetection(names, data.copy())

    np.testing.assert_array_equal(ours.get(cam="b").get_data(),
                                  ref.get(cam="b").get_data())
    np.testing.assert_array_equal(ours.get(im_num=2).get_data(),
                                  ref.get(im_num=2).get_data())
    np.testing.assert_array_equal(
        ours.sort(["cam", "im_num", "key"]).get_data(),
        ref.sort(["cam", "im_num", "key"]).get_data())
    np.testing.assert_array_equal(
        ours.return_flattened_keys((4, 6)).get_data(),
        ref.return_flattened_keys((4, 6)).get_data())
    np.testing.assert_array_equal(ours.features_per_im_per_cam(),
                                  ref.features_per_im_per_cam())


def _reference_problem():
    """Identical synthetic problem built for BOTH implementations."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    th = import_reference("pyCamSet.optimisation.template_handler")
    rtd = import_reference("pyCamSet.calibration_targets.target_detections")
    rcs = import_reference("pyCamSet.cameras.camera_set")
    RefCam = sys.modules["pyCamSet.cameras.camera"].Camera

    rig = make_synthetic_rig(n_cams=2, n_ims=3, grid=4, visibility=1.0,
                             noise_px=0.2, seed=3)
    k_mats, exts = [], []
    ref_cams = {}
    for c in range(2):
        i9 = rig["intr"][c]
        k = np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1.0]])
        ext = make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:])
        k_mats.append(k)
        exts.append(ext)
        ref_cams[f"c{c}"] = RefCam(extrinsic=ext, intrinsic=k,
                                   distortion_coefs=i9[4:], res=[1600, 1200],
                                   name=f"c{c}")

    class FakeTarget:
        point_data = rig["template"].reshape(1, -1, 3)

    ref_h = th.TemplateBundleHandler(
        camset=rcs.CameraSet(camera_dict=ref_cams), target=FakeTarget(),
        detection=rtd.TargetDetection(cam_names=["c0", "c1"],
                                      data=rig["dd"]),
        options={"outliers": "n"})

    ours_cs = CameraSet(camera_dict=make_cam_dict(
        ["c0", "c1"], exts, k_mats,
        [rig["intr"][c][4:] for c in range(2)], [[1600, 1200]] * 2))
    our_h = TemplateBundleHandler(
        ours_cs, FreePointTarget(rig["template"].reshape(1, -1, 3)),
        __import__("pycamset_tpu.models.detections",
                   fromlist=["TargetDetection"]).TargetDetection(
            cam_names=["c0", "c1"], data=rig["dd"]),
        options={"outliers": "n"})

    x_free = np.concatenate([rig["intr"].ravel(), rig["extr"].ravel(),
                             rig["poses"][1:].ravel()])
    return ref_h, our_h, x_free


def test_full_template_loss_matches_reference_generated_kernel():
    """The reference's code-generated full BA residual (exec'd in pure
    Python) vs our jitted residual, row-for-row at identical parameters."""
    from pycamset_tpu.optim.driver import make_optimisation_function
    ref_h, our_h, x_free = _reference_problem()
    with reference_stubs():  # codegen imports its template module lazily
        ref_loss = ref_h.make_loss_fun(threads=1)
    our_loss, _, _ = make_optimisation_function(our_h)
    r_ref = np.asarray(ref_loss(x_free)).reshape(-1)
    r_ours = np.asarray(our_loss(x_free)).reshape(-1)
    assert r_ref.shape == r_ours.shape
    np.testing.assert_allclose(r_ours, r_ref, atol=1e-10)


def test_full_template_jacobian_matches_reference_loss_fd():
    """The reference's generated-jacobian driver needs numba scratch-memory
    plumbing that does not survive the numba stub, so compare our analytic
    sparse Jacobian against central differences OF THE REFERENCE LOSS —
    given the losses agree to 1e-13, this pins the Jacobian to the
    reference's objective."""
    from pycamset_tpu.optim.driver import make_optimisation_function
    ref_h, our_h, x_free = _reference_problem()
    with reference_stubs():  # codegen imports its template module lazily
        ref_loss = ref_h.make_loss_fun(threads=1)
    _, our_jac_fn, _ = make_optimisation_function(our_h)
    j_ours = our_jac_fn(x_free).toarray()
    rng = np.random.default_rng(1)
    for j in rng.choice(x_free.size, 10, replace=False):
        eps = 1e-6 * max(1.0, abs(x_free[j]))
        dp = np.zeros_like(x_free)
        dp[j] = eps
        num = (np.asarray(ref_loss(x_free + dp)).reshape(-1)
               - np.asarray(ref_loss(x_free - dp)).reshape(-1)) / (2 * eps)
        np.testing.assert_allclose(j_ours[:, j], num, atol=2e-4, rtol=2e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
