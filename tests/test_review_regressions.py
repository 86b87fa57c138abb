"""Regression tests for code-review findings (round 1 review)."""
import numpy as np
import pytest


def _rig_camset(rig, names, identity_cam0=False):
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    k_mats, exts, dists = [], [], []
    for c in range(len(names)):
        i9 = rig["intr"][c]
        k_mats.append(np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]],
                                [0, 0, 1]]))
        dists.append(i9[4:])
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    if identity_cam0:
        exts[0] = np.eye(4)
    return CameraSet(camera_dict=make_cam_dict(
        names, exts, k_mats, dists, [[1600, 1200]] * len(names)))


def test_selfcal_cold_start_param_length():
    """SelfBundleHandler without a warm start used to append the free bundle
    points twice, crashing the solver with a length mismatch."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import FreePointTarget, SelfBundleHandler
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=0.95,
                             noise_px=0.2, seed=29)
    cams = _rig_camset(rig, ["a", "b", "c"])
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    handler = SelfBundleHandler(cams, target, det, options={"outliers": "n"})

    x0 = handler.get_initial_params()
    assert x0.size == int(handler.bundlePrimitive.unfixed_full().sum())

    result, _ = run_bundle_adjustment(handler)  # cold start must not crash
    assert np.sqrt(np.mean(result["fun"] ** 2)) < 0.3


def test_padded_key_slots_stay_finite_with_identity_camera():
    """Zero-filled pad slots used to project at z=0 (inf*0=NaN) when a camera
    sits at the world origin; pads now replicate a real point."""
    import jax.numpy as jnp
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.handlers import (
        FreePointBundleHandler, FreePointTarget)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    # grid=7 -> 49 keys, far from the 128 pad multiple
    rig = make_synthetic_rig(n_cams=3, n_ims=1, grid=7, visibility=1.0,
                             noise_px=0.1, seed=31)
    cams = _rig_camset(rig, ["a", "b", "c"], identity_cam0=False)
    # move cam0 to the canonical SfM origin and regenerate its observations
    import pycamset_tpu.utils.general_utils as gu
    cams[0].set_extrinsic(np.eye(4))
    dd = rig["dd"].copy()
    world = rig["template"] + [0.0, 0.0, 1.0]  # keep points in front of cam0
    rows0 = dd[:, 0] == 0
    keys0 = dd[rows0, 2].astype(int)
    dd[rows0, 3:5] = cams[0].project_points(world[keys0])
    for c in (1, 2):
        rows = dd[:, 0] == c
        keys = dd[rows, 2].astype(int)
        dd[rows, 3:5] = cams[c].project_points(world[keys])

    target = FreePointTarget((world + np.random.default_rng(1).normal(
        size=world.shape) * 1e-3).reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=dd)
    handler = FreePointBundleHandler(
        cams, target, det, options={"outliers": "n"})
    result, _ = run_bundle_adjustment(handler)
    assert np.all(np.isfinite(result["fun"]))
    assert np.sqrt(np.mean(result["fun"] ** 2)) < 1.0


def test_fixed_pose_none_keeps_all_poses_free():
    """options={'fixed_pose': None} used to fix EVERY pose via numpy new-axis
    assignment."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=4, grid=4, visibility=0.9,
                             noise_px=0.2, seed=37)
    cams = _rig_camset(rig, ["a", "b", "c"])
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    handler = TemplateBundleHandler(
        cams, target, det, options={"outliers": "n", "fixed_pose": None})
    assert np.all(handler.bundlePrimitive.poses_unfixed)


def test_leading_pose_gap_backfills():
    """A camera with no usable pose in image 0 used to abort the whole
    calibration ('No pose in first image'); the gap now back-fills."""
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (
        FreePointTarget, TemplateBundleHandler)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=6, grid=5, visibility=0.95,
                             noise_px=0.2, seed=41)
    dd = rig["dd"]
    # remove camera 2's observations of image 0 entirely
    dd = dd[~((dd[:, 0] == 2) & (dd[:, 1] == 0))]
    cams = _rig_camset(rig, ["a", "b", "c"])
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=dd)
    handler = TemplateBundleHandler(cams, target, det,
                                    options={"outliers": "n", "ref_pose": 1})
    x0 = handler.get_initial_params()   # must not raise
    assert np.all(np.isfinite(x0))
    assert not np.any(handler.missing_poses)  # other cams saw image 0


def test_generic_backend_applies_robust_loss():
    """The generic (scatter) backend used to silently ignore loss options."""
    import jax.numpy as jnp
    from pycamset_tpu.optim.blocks import (
        Extrinsic3D, FreePoint, Projection, TemplatePoints)
    from pycamset_tpu.optim.chain import OptimFunction
    from pycamset_tpu.optim.residuals import (
        build_detection_arrays, make_neq_fn)
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=2, n_ims=3, grid=4, visibility=1.0,
                             noise_px=0.1, seed=43)
    dd = rig["dd"].copy()
    dd[0, 3:5] += 100.0  # one gross outlier
    op_fun = OptimFunction([Projection(), Extrinsic3D(), TemplatePoints()])
    struct = op_fun.param_struct(2, 3, rig["n_keys"])
    det = build_detection_arrays(op_fun, struct, dd, rig["template"],
                                 pad_multiple=64)
    full = jnp.asarray(np.concatenate(
        [rig["intr"].ravel(), rig["extr"].ravel(), rig["poses"].ravel()]))
    darrs = det.as_device(jnp.float64)
    _, _, cost_lin = make_neq_fn(op_fun)(full, *darrs)
    _, _, cost_cauchy = make_neq_fn(op_fun, loss="cauchy")(full, *darrs)
    # the robust cost bounds the outlier's influence
    assert float(cost_cauchy) < float(cost_lin) / 50


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_triangulation_group_order_matches_row_order():
    """multi_cam_triangulate must return groups in first-appearance order of
    the input table (consumers pair outputs with row-order poses/keys)."""
    from pycamset_tpu.utils.synthetic import make_synthetic_rig
    rig = make_synthetic_rig(n_cams=3, n_ims=3, grid=4, visibility=1.0,
                             noise_px=0.0, seed=47)
    cams = _rig_camset(rig, ["a", "b", "c"])
    import pycamset_tpu.utils.general_utils as gu
    det_data = rig["dd"]
    # sort key-major (as get_calibration_points does) and triangulate
    from pycamset_tpu.models.detections import TargetDetection
    det = TargetDetection(cam_names=["a", "b", "c"], data=det_data)
    table = det.sort(["key", "im_num"]).get_data()
    recon, subset, used, uniq = cams.multi_cam_triangulate(
        table, return_used=True)
    # expected world points, paired row-order like the consumers do
    first_rows = np.sort(np.unique(subset[:, 1:-2], axis=0,
                                   return_index=True)[1])
    ims = subset[first_rows, 1].astype(int)
    keys = subset[first_rows, 2].astype(int)
    for point, im, key in zip(recon, ims, keys):
        t = gu.make_4x4h_tform(rig["poses"][im][:3], rig["poses"][im][3:])
        expect = gu.h_tform(rig["template"][key], t)
        np.testing.assert_allclose(point, expect, atol=1e-6)
    # uniq rows agree with the same pairing
    np.testing.assert_allclose(uniq[:, 0], ims)
    # used indices point at rows of the right group
    for g, rows in enumerate(used):
        np.testing.assert_allclose(subset[first_rows[g], 1:-2],
                                   table[rows][0, 1:-2])


def test_triangulation_degenerate_inputs():
    """Single-camera and empty inputs return empty results, not crashes."""
    from pycamset_tpu.utils.synthetic import make_synthetic_rig
    rig = make_synthetic_rig(n_cams=2, n_ims=1, grid=3, visibility=1.0,
                             noise_px=0.0, seed=53)
    cams = _rig_camset(rig, ["a", "b"])
    assert cams.multi_cam_triangulate({"a": (10.0, 20.0)}).shape == (0, 3)
    assert cams.multi_cam_triangulate([]).shape == (0, 3)


def test_max_ims_flushes_buffer():
    from pycamset_tpu.models.detections import ImageDetection, TargetDetection
    det = TargetDetection(cam_names=["x"])
    det.add_detection("x", 5, ImageDetection([0], [[1.0, 2.0]]))
    assert det.max_ims == 6
    assert len(det.get_image_list()) == 6


def test_mixed_chain_without_group_map_raises_clear_diagnostic():
    """A mixed PER_KEY+PER_GROUP chain whose handler never implements
    group_of_key()/n_groups() must raise UnsupportedChain (caught by
    run_bundle_adjustment's generic fallback), not an opaque TypeError
    from np.asarray(None) (advisor r2 finding)."""
    import pytest

    from pycamset_tpu.optim.structured import UnsupportedChain
    from pycamset_tpu.optim.structured_driver import (
        build_mixed_structured_problem)

    class NoGroupsHandler:
        def group_of_key(self):
            return None

        def n_groups(self):
            return 0

        # build_mixed_structured_problem must fail on the group check
        # BEFORE touching any of these
        def __getattr__(self, name):
            raise AssertionError(f"reached {name} before the group check")

    import jax.numpy as jnp
    with pytest.raises(UnsupportedChain, match="group_of_key"):
        build_mixed_structured_problem(NoGroupsHandler(), jnp.float64)
