"""Automatic camera-model selection (calibration/model_select.py).

Beyond-reference capability: the reference fixes the 5-coefficient Brown
model, so there is no parity target — these tests pin the selection
machinery (image-level splitting, holdout scoring, parsimony rule) and
two end-to-end discriminations on synthetic rigs: an underfitting model
loses on holdout error; an overparameterised model loses on parsimony.
"""
import numpy as np
import pytest

from pycamset_tpu.calibration.model_select import (
    ModelScore, pick_model, select_camera_model, split_detection_images,
    subset_ims)
from pycamset_tpu.models.detections import TargetDetection


def _table(n_cams=2, n_ims=6, n_keys=4):
    rows = []
    for c in range(n_cams):
        for i in range(n_ims):
            for k in range(n_keys):
                rows.append([c, i, k, 10.0 * i + k, 5.0 * c + k])
    return TargetDetection(cam_names=[f"c{j}" for j in range(n_cams)],
                           data=np.array(rows, dtype=float))


class TestSplitting:
    def test_subset_ims_renumbers_contiguously(self):
        det = _table(n_ims=6)
        sub = subset_ims(det, [1, 4, 5])
        rows = sub.get_data()
        assert sub.max_ims == 3
        assert set(rows[:, 1].astype(int)) == {0, 1, 2}
        # renumbering preserves per-image content: new image 1 is old 4
        old = det.get_data()
        np.testing.assert_array_equal(
            rows[rows[:, 1] == 1][:, [0, 2, 3, 4]],
            old[old[:, 1] == 4][:, [0, 2, 3, 4]])

    def test_split_is_disjoint_covering_and_deterministic(self):
        det = _table(n_ims=8)
        tr1, ho1 = split_detection_images(det, holdout_fraction=0.25, seed=3)
        tr2, ho2 = split_detection_images(det, holdout_fraction=0.25, seed=3)
        assert tr1.max_ims == tr2.max_ims and ho1.max_ims == ho2.max_ims
        np.testing.assert_array_equal(tr1.get_data(), tr2.get_data())
        assert tr1.max_ims + ho1.max_ims == 8
        assert ho1.max_ims == 2  # round(0.25 * 8)
        # disjoint: the (u, v) payloads identify original images uniquely
        tr_ims = {tuple(r) for r in tr1.get_data()[:, 3:5]}
        ho_ims = {tuple(r) for r in ho1.get_data()[:, 3:5]}
        assert not tr_ims & ho_ims

    def test_split_respects_min_train(self):
        det = _table(n_ims=5)
        tr, ho = split_detection_images(det, holdout_fraction=0.9, seed=0,
                                        min_train=4)
        assert tr.max_ims == 4 and ho.max_ims == 1

    def test_split_too_few_images_raises(self):
        with pytest.raises(ValueError, match="images"):
            split_detection_images(_table(n_ims=4), min_train=4,
                                   min_holdout=1)


class TestPickModel:
    def test_lowest_holdout_wins_outside_tolerance(self):
        scores = [
            ModelScore("standard", 9, 0.30, 0.50, 100, 20),
            ModelScore("rational", 12, 0.10, 0.12, 100, 20),
        ]
        assert pick_model(scores).model == "rational"

    def test_parsimony_breaks_near_ties(self):
        scores = [
            ModelScore("rational", 12, 0.09, 0.1000, 100, 20),
            ModelScore("standard", 9, 0.11, 0.1015, 100, 20),  # within 2%
        ]
        assert pick_model(scores).model == "standard"
        # a tighter tolerance flips it back to the raw winner
        assert pick_model(scores, parsimony_tol=1e-4).model == "rational"

    def test_empty_scores_raise(self):
        with pytest.raises(ValueError):
            pick_model([])

    def test_nan_scores_are_failed_candidates(self):
        # a NaN-first ordering must not poison min(): the NaN candidate
        # is dropped like a raised one, regardless of position
        scores = [
            ModelScore("rational", 12, 0.1, float("nan"), 100, 20),
            ModelScore("standard", 9, 0.3, 0.50, 100, 20),
        ]
        assert pick_model(scores).model == "standard"
        assert pick_model(scores[::-1]).model == "standard"
        with pytest.raises(ValueError, match="finite"):
            pick_model([scores[0]])


def _rig_cams_det(camera_model: str, seed: int, n_ims: int = 14,
                  noise_px: float = 0.05, pose_scale=(0.4, 0.15)):
    """Synthetic rig -> (CameraSet seeded with truncated distortion,
    FreePointTarget, TargetDetection)."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.optim.handlers import FreePointTarget
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=3, n_ims=n_ims, grid=7, visibility=0.95,
                             noise_px=noise_px, seed=seed,
                             camera_model=camera_model,
                             pose_scale=pose_scale)
    k_mats, exts, dists = [], [], []
    for c in range(3):
        intr = rig["intr"][c]
        k_mats.append(np.array([[intr[0], 0, intr[1]],
                                [0, intr[2], intr[3]], [0, 0, 1]]))
        dists.append(intr[4:9])  # truncated seed: BA recovers the tail
        exts.append(make_4x4h_tform(rig["extr"][c][:3], rig["extr"][c][3:]))
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b", "c"], exts, k_mats, dists, [[1600, 1200]] * 3))
    target = FreePointTarget(rig["template"].reshape(1, -1, 3))
    det = TargetDetection(cam_names=["a", "b", "c"], data=rig["dd"])
    return cams, target, det, rig


@pytest.mark.slow
class TestEndToEndSelection:
    def test_underfit_model_loses_on_holdout(self):
        # fisheye (Kannala-Brandt) data: a different projection FAMILY the
        # Brown polynomial cannot express at wide angles — the decisive
        # underfit case. (Within the Brown family, synthetic rigs are
        # absorbable to the noise floor by the 5-coefficient model — the
        # parsimony test below covers that regime.) This also exercises
        # the cross-family seed adaptation (_family_seed): the candidates
        # share one 4-wide-marked fisheye seed camset.
        # wide pose spread: field angles reach ~58 deg (p90 ~47), where
        # the Brown radial polynomial can no longer track the equidistant
        # theta mapping; narrow-angle rigs ARE Brown-absorbable
        cams, target, det, rig = _rig_cams_det("fisheye", seed=21,
                                               pose_scale=(0.6, 0.45))
        model, scores = select_camera_model(
            det, target, initial_cams=cams,
            candidates=("standard", "fisheye"), seed=2)
        assert model == "fisheye"
        by = {s.model: s for s in scores}
        assert by["fisheye"].holdout_rms < 3.0 * rig["noise_px"]
        assert (by["standard"].holdout_rms
                > 1.5 * by["fisheye"].holdout_rms)

    def test_parsimony_rejects_overparameterised_model(self):
        # standard data: thin_prism matches the noise floor too, so the
        # simpler model must win on the parsimony rule
        cams, target, det, rig = _rig_cams_det("standard", seed=22)
        model, scores = select_camera_model(
            det, target, initial_cams=cams,
            candidates=("thin_prism", "standard"), seed=2,
            parsimony_tol=0.05)
        assert model == "standard"
        by = {s.model: s for s in scores}
        # both models reach the holdout noise floor on true-standard data
        assert by["standard"].holdout_rms < 3.0 * rig["noise_px"]

    def test_failed_candidate_is_skipped(self):
        cams, target, det, _ = _rig_cams_det("standard", seed=23, n_ims=8)
        with pytest.raises(ValueError, match="unknown camera model"):
            select_camera_model(det, target, initial_cams=cams,
                                candidates=("standard", "nosuch"))
