"""Automatic camera-model selection by held-out reprojection error.

Beyond-reference capability: the reference fixes the 5-coefficient
Brown-Conrady model everywhere (pyCamSet/cameras/camera.py distortion
handling; its calibrate_cameras has no model choice). This repo ships five
models (standard / rational / thin_prism / tilted / fisheye), which raises
the question the reference never has to answer: WHICH model fits a given
rig? More coefficients always reduce the training residual — the honest
criterion is generalisation, not fit.

The selector cross-validates over target poses:

1. split the detection table's images into a train and a holdout set;
2. for each candidate model, bundle-adjust on the train images only;
3. freeze the trained cameras and solve ONLY the target pose for each
   holdout image (`optim.find_target.estimate_poses_with_fixed_cameras` —
   a jointly-optimal multi-camera PnP), scoring its reprojection rms;
4. pick the model with the lowest holdout rms, preferring FEWER
   parameters whenever a simpler model sits within ``parsimony_tol`` of
   the best (an overparameterised model that only matches the simpler
   one's holdout error has fitted noise).

Exposed through the pipeline as
``calibrate_cameras(..., problem_options={"camera_model": "auto"})`` and
the CLI's ``--camera-model auto``.
"""
from __future__ import annotations

import logging
from typing import NamedTuple, Sequence

import numpy as np

from pycamset_tpu.models.detections import TargetDetection
# intrinsic parameter count per camera, the parsimony ordering — the
# handlers' validation table is the single source of truth
from pycamset_tpu.optim.handlers import _CAMERA_MODELS as _MODEL_WIDTHS

# fisheye is excluded by default: it is a different projection family
# (Kannala-Brandt theta-polynomial, for >100 deg lenses) whose cv2 seeding
# rejects narrow-lens data outright — ask for it explicitly when the rig
# is actually fisheye.
DEFAULT_CANDIDATES = ("standard", "rational", "thin_prism", "tilted")


class ModelScore(NamedTuple):
    """One candidate's scorecard."""
    model: str
    n_intr: int            # intrinsic params per camera
    train_rms: float       # px, on the train images at the BA solution
    holdout_rms: float     # px, on held-out images with pose-only solves
    n_train_dets: int
    n_holdout_dets: int


def subset_ims(detection: TargetDetection, im_ids: np.ndarray
               ) -> TargetDetection:
    """The detection rows of ``im_ids`` only, renumbered contiguously.

    The handlers iterate images 0..max_ims-1, so a subset must be
    renumbered (rank within the sorted kept ids), not just filtered.
    """
    rows = detection.get_data()
    if rows is None:
        raise ValueError("detection table has no data to subset")
    keep_ids = np.unique(np.asarray(im_ids, dtype=int))
    im_col = rows[:, 1].astype(int)
    sel = np.isin(im_col, keep_ids)
    out = rows[sel].copy()
    out[:, 1] = np.searchsorted(keep_ids, im_col[sel])
    return TargetDetection(cam_names=detection.cam_names, data=out,
                           max_ims=len(keep_ids))


def split_detection_images(detection: TargetDetection,
                           holdout_fraction: float = 0.25, seed: int = 0,
                           min_train: int = 4, min_holdout: int = 1
                           ) -> tuple[TargetDetection, TargetDetection]:
    """Random image-level train/holdout split (deterministic in ``seed``).

    Splitting by image — the unit the pose parameters attach to — keeps
    the holdout genuinely unseen: no holdout observation shares a pose
    with any training observation.
    """
    rows = detection.get_data()
    if rows is None:
        raise ValueError("detection table has no data to split")
    im_ids = np.unique(rows[:, 1].astype(int))
    if len(im_ids) < min_train + min_holdout:
        raise ValueError(
            f"model selection needs >= {min_train + min_holdout} images "
            f"with detections; this table has {len(im_ids)}")
    rng = np.random.default_rng(seed)
    shuffled = rng.permutation(im_ids)
    n_hold = int(round(holdout_fraction * len(im_ids)))
    n_hold = max(min_holdout, min(n_hold, len(im_ids) - min_train))
    hold_ids, train_ids = shuffled[:n_hold], shuffled[n_hold:]
    return subset_ims(detection, train_ids), subset_ims(detection, hold_ids)


def _rms_px(fun: np.ndarray) -> float:
    """Residual vector (flat u/v components) -> rms in px per component
    pair: sqrt(cost / (2 n)) == sqrt(mean(fun^2))."""
    return float(np.sqrt(np.mean(np.square(fun))))


def _family_seed(initial_cams, model):
    """A seed CameraSet whose distortion width matches ``model``'s family.

    The 4-wide distortion vector is the fisheye marker throughout the
    package (a Brown handler rejects it and vice versa), so scoring a
    fisheye candidate from a Brown seed — or the reverse — swaps in a
    zero-distortion vector of the right family width. Within a family
    the handler pads the tail itself. ``model`` may be a per-camera
    {name: model} map (per-camera auto selection picked a mixed rig).
    """
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict

    names = initial_cams.get_names()
    if isinstance(model, dict):
        fisheye_of = {str(k): v == "fisheye" for k, v in model.items()}
    else:
        fisheye_of = {str(n): model == "fisheye" for n in names}
    dists, changed = [], False
    for n in names:
        want_fisheye = fisheye_of[str(n)]
        d = np.reshape(np.asarray(initial_cams[n].distortion_coefs,
                                  dtype=float), -1)
        if (d.size == 4) != want_fisheye:
            d = np.zeros(4 if want_fisheye else 5)
            changed = True
        dists.append(d)
    if not changed:
        return initial_cams
    return CameraSet(camera_dict=make_cam_dict(
        names, [np.asarray(initial_cams[n].extrinsic) for n in names],
        [np.asarray(initial_cams[n].intrinsic) for n in names],
        dists, [initial_cams[n].res for n in names]))


def score_camera_model(model: str, train_det: TargetDetection,
                       holdout_det: TargetDetection, target,
                       initial_cams, fixed_params: dict | None = None,
                       problem_options: dict | None = None) -> ModelScore:
    """Train ``model`` on the train split; score it on the holdout split.

    ``initial_cams`` may carry any seed distortion width — the handler
    pads/truncates the seed to the model's width (zero-extended tails).
    """
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.find_target import (
        estimate_poses_with_fixed_cameras)
    from pycamset_tpu.optim.handlers import TemplateBundleHandler

    opts = dict(problem_options or {})
    opts.update({"camera_model": model, "outliers": "n", "verbosity": 0})
    handler = TemplateBundleHandler(
        camset=_family_seed(initial_cams, model), detection=train_det,
        target=target, fixed_params=fixed_params, options=opts)
    result, trained = run_bundle_adjustment(
        handler, backend=opts.get("backend", "auto"))

    _poses, hold_res = estimate_poses_with_fixed_cameras(
        trained, target, holdout_det)
    return ModelScore(model=model, n_intr=_MODEL_WIDTHS[model],
                      train_rms=_rms_px(result["fun"]),
                      holdout_rms=_rms_px(hold_res["fun"]),
                      n_train_dets=result["fun"].size // 2,
                      n_holdout_dets=hold_res["fun"].size // 2)


def pick_model(scores: Sequence[ModelScore],
               parsimony_tol: float = 0.02) -> ModelScore:
    """Lowest holdout rms, preferring fewer parameters within tolerance.

    Among every candidate whose holdout rms is within
    ``(1 + parsimony_tol)`` of the best, the one with the fewest
    intrinsic parameters wins — extra coefficients must EARN their keep
    on data they were not fitted to.
    """
    # a candidate whose pose solves diverged scores NaN without raising;
    # treat it as failed rather than letting NaN poison min()
    finite = [s for s in scores if np.isfinite(s.holdout_rms)]
    if not finite:
        raise ValueError("no candidate model produced a finite score")
    best = min(s.holdout_rms for s in finite)
    viable = [s for s in finite if s.holdout_rms <= best * (1 + parsimony_tol)]
    return min(viable, key=lambda s: (s.n_intr, s.holdout_rms))


def _single_cam_detection(det: TargetDetection, c: int) -> TargetDetection:
    """One camera's rows as a standalone 1-camera detection table."""
    rows = det.get_data()
    sel = rows[:, 0].astype(int) == c
    out = rows[sel].copy()
    out[:, 0] = 0
    return TargetDetection(cam_names=[det.cam_names[c]], data=out,
                           max_ims=det.max_ims)


def score_models_per_camera(candidates, train_det, holdout_det, target,
                            initial_cams, fisheye_seed=None,
                            fixed_params: dict | None = None,
                            problem_options: dict | None = None):
    """Per-camera holdout scores from per-camera INDEPENDENT solves.

    Each camera trains alone (1-camera template BA with its extrinsic
    pinned to identity — the per-image poses absorb the gauge) and is
    scored by pose-only solves on its own holdout rows, so one camera's
    family mismatch cannot contaminate another's score through shared
    target poses.

    :return: ({model: {cam_name: holdout_rms}}, scorecards) — a failed
        (cam, model) cell scores NaN.
    """
    from pycamset_tpu.optim.driver import run_bundle_adjustment
    from pycamset_tpu.optim.find_target import (
        estimate_poses_with_fixed_cameras)
    from pycamset_tpu.optim.handlers import TemplateBundleHandler

    per_cam_scores: dict = {m: {} for m in candidates}
    scores: list[ModelScore] = []
    for model in candidates:
        seed_all = (fisheye_seed if model == "fisheye"
                    and fisheye_seed is not None else initial_cams)
        train_rms2, hold_rms2 = [], []
        n_train = n_hold = 0
        for c, name in enumerate(train_det.cam_names):
            name = str(name)
            try:
                cam_train = _single_cam_detection(train_det, c)
                cam_hold = _single_cam_detection(holdout_det, c)
                seed1 = _family_seed(seed_all.make_subset([c]), model)
                opts = dict(problem_options or {})
                opts.update({"camera_model": model, "outliers": "n",
                             "verbosity": 0})
                handler = TemplateBundleHandler(
                    camset=seed1, detection=cam_train, target=target,
                    fixed_params={name: {"ext": np.eye(4)}}, options=opts)
                result, trained = run_bundle_adjustment(
                    handler, backend=opts.get("backend", "auto"))
                _p, hres = estimate_poses_with_fixed_cameras(
                    trained, target, cam_hold)
                per_cam_scores[model][name] = _rms_px(hres["fun"])
                train_rms2.append(np.sum(np.square(result["fun"])))
                hold_rms2.append(np.sum(np.square(hres["fun"])))
                n_train += result["fun"].size // 2
                n_hold += hres["fun"].size // 2
            except Exception as e:
                logging.warning(f"camera model {model!r} failed for camera "
                                f"{name!r}: {e!r}")
                per_cam_scores[model][name] = np.nan
        if n_train and n_hold:
            scores.append(ModelScore(
                model=model, n_intr=_MODEL_WIDTHS[model],
                train_rms=float(np.sqrt(np.sum(train_rms2) / (2 * n_train))),
                holdout_rms=float(np.sqrt(np.sum(hold_rms2) / (2 * n_hold))),
                n_train_dets=n_train, n_holdout_dets=n_hold))
        for name, rms in per_cam_scores[model].items():
            logging.info(f"model {model:>10} / {name}: "
                         f"holdout {rms:.4f} px")
    return per_cam_scores, scores


def pick_model_per_camera(per_cam_scores: dict, cam_names,
                          parsimony_tol: float = 0.02):
    """Per-camera winners from {model: {cam: holdout_rms}} scorecards.

    Same parsimony rule as pick_model, applied per camera. Returns a
    single model name when every camera agrees, else the {cam: model}
    map a heterogeneous handler consumes.
    """
    winners = {}
    for name in (str(n) for n in cam_names):
        rows = [(m, rms[name]) for m, rms in per_cam_scores.items()
                if np.isfinite(rms.get(name, np.nan))]
        if not rows:
            raise ValueError(
                f"no candidate model produced a finite holdout score for "
                f"camera {name!r}")
        best = min(r for _, r in rows)
        viable = [(m, r) for m, r in rows
                  if r <= best * (1 + parsimony_tol)]
        winners[name] = min(
            viable, key=lambda mr: (_MODEL_WIDTHS[mr[0]], mr[1]))[0]
    picks = set(winners.values())
    return winners[str(cam_names[0])] if len(picks) == 1 else winners


def select_camera_model(detection: TargetDetection, target,
                        initial_cams=None, cam_res: list | None = None,
                        candidates: Sequence[str] = DEFAULT_CANDIDATES,
                        holdout_fraction: float = 0.25, seed: int = 0,
                        parsimony_tol: float = 0.02,
                        fixed_params: dict | None = None,
                        problem_options: dict | None = None,
                        per_camera: bool = False
                        ) -> tuple[str, list[ModelScore]]:
    """Cross-validated camera-model selection.

    :param detection: the full detection table.
    :param target: the calibration target (template geometry).
    :param initial_cams: seed CameraSet; when None, seeded once from the
        target's own initial-calibration method (``cam_res`` required).
    :param candidates: model names to try (fisheye only by request — see
        DEFAULT_CANDIDATES).
    :param holdout_fraction: fraction of images held out for scoring.
    :param seed: train/holdout split seed.
    :param parsimony_tol: relative holdout-rms band within which a model
        with fewer parameters beats a lower-error one.
    :param per_camera: pick a model PER CAMERA from the per-camera
        holdout scores (parsimony applied camera-wise). Mixed picks
        return a {cam: model} map — including fisheye + Brown, which
        calibrates heterogeneously (optim.handlers.parse_camera_models).
    :return: (winning model name OR per-camera map, per-candidate
        scorecards). A candidate whose train or scoring solve raises is
        logged and skipped; at least one candidate must survive.
    """
    bad = sorted(set(candidates) - set(_MODEL_WIDTHS))
    if bad:
        raise ValueError(f"unknown camera model(s) {bad}; expected a "
                         f"subset of {sorted(_MODEL_WIDTHS)}")
    train_det, holdout_det = split_detection_images(
        detection, holdout_fraction=holdout_fraction, seed=seed)

    fisheye_seed = None
    if initial_cams is None:
        if cam_res is None:
            raise ValueError("pass initial_cams or cam_res (the per-camera "
                             "resolutions needed to seed from scratch)")
        from pycamset_tpu.calibration.camera_calibrator import (
            run_initial_calibration)
        # one Brown-family seeding shared by every Brown candidate (the
        # handler pads the 5-coefficient tail to each model's width); a
        # fisheye candidate gets its own native seeding when possible
        initial_cams = run_initial_calibration(
            train_det, target, cam_res, save=False,
            fixed_params=fixed_params, camera_model="standard")
        if "fisheye" in candidates:
            try:
                fisheye_seed = run_initial_calibration(
                    train_det, target, cam_res, save=False,
                    fixed_params=fixed_params, camera_model="fisheye")
            except Exception as e:  # narrow-lens data: cv2.fisheye rejects
                logging.info(f"native fisheye seeding unavailable ({e!r}); "
                             "the fisheye candidate starts from zero "
                             "equidistant distortion")

    if per_camera:
        # per-camera selection must come from per-camera INDEPENDENT
        # solves: in a joint rig-wide candidate solve a wrong family on
        # one camera drags the shared target poses and contaminates every
        # other camera's holdout score
        per_cam_scores, scores = score_models_per_camera(
            candidates, train_det, holdout_det, target, initial_cams,
            fisheye_seed=fisheye_seed, fixed_params=fixed_params,
            problem_options=problem_options)
        picked = pick_model_per_camera(per_cam_scores, detection.cam_names,
                                       parsimony_tol=parsimony_tol)
        logging.info(f"selected per-camera model(s): {picked!r}")
        return picked, scores

    scores: list[ModelScore] = []
    errors: list[str] = []
    for model in candidates:
        seed_cams = (fisheye_seed if model == "fisheye"
                     and fisheye_seed is not None else initial_cams)
        try:
            s = score_camera_model(
                model, train_det, holdout_det, target, seed_cams,
                fixed_params=fixed_params,
                problem_options=problem_options)
        except Exception as e:  # a model that cannot fit is a result,
            logging.warning(     # not a crash of the selection
                f"camera model {model!r} failed during selection: {e!r}")
            errors.append(f"{model}: {e!r}")
            continue
        logging.info(f"model {model:>10}: train {s.train_rms:.4f} px, "
                     f"holdout {s.holdout_rms:.4f} px "
                     f"({s.n_intr} intrinsics/cam)")
        scores.append(s)
    if not scores:
        raise RuntimeError(
            "every candidate camera model failed during selection:\n  "
            + "\n  ".join(errors))

    winner = pick_model(scores, parsimony_tol=parsimony_tol)
    logging.info(f"selected camera model {winner.model!r} "
                 f"(holdout {winner.holdout_rms:.4f} px)")
    return winner.model, scores
