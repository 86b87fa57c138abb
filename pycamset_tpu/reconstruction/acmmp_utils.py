"""MVSNet / ACMMP export parameters and view-pair selection.

Capability parity target (reference, behaviour only):
pyCamSet/reconstruction/acmmp_utils.py — ReconParams (depth range/steps,
angle limits, max views), calc_pairs (view-pair selection by inter-camera
view angle), write_pair_file (pair.txt format).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ReconParams:
    """Expected parameters for ACMMP / MVSNet exports."""
    mindist: float = 0.1
    maxdist: float = 0.8
    steps: int = 192
    minangle: float = 3
    maxangle: float = 45
    max_n_view: int = 9


def get_v_vec(ext: np.ndarray) -> np.ndarray:
    """View vector of a camera from its extrinsic matrix."""
    return ext[:3, :3] @ np.array([0, 0, 1])


def calc_pairs(c_vec: np.ndarray, r_param: ReconParams, rng=None,
               pick_closest: bool = False) -> list[np.ndarray]:
    """Acceptable reconstruction pairs per camera from view vectors.

    Pairs must subtend an inter-view angle within [minangle, maxangle]; when
    more than max_n_view qualify, picks the closest-angle subset (or a random
    one).
    """
    if rng is None:
        rng = np.random.default_rng()
    c_vec = np.asarray(c_vec, dtype=float)
    c_vec = c_vec / np.linalg.norm(c_vec, axis=1, keepdims=True)
    cosang = np.clip(np.sum(c_vec[None, ...] * c_vec[:, None], axis=-1), -1, 1)
    ang = np.arccos(cosang) * 180 / np.pi
    mask = np.logical_and(ang > r_param.minangle, ang < r_param.maxangle)
    pairs = []
    for idx, masklet in enumerate(mask):
        valid = np.where(masklet)[0]
        if len(valid) < r_param.max_n_view:
            pairs.append(valid)
        elif not pick_closest:
            pairs.append(rng.choice(valid, r_param.max_n_view, replace=False))
        else:
            order = np.argsort(ang[idx, valid])
            pairs.append(valid[order][: r_param.max_n_view])
    return pairs


def write_pair_file(f, pair_list) -> None:
    """Write a pair list in the MVSNet pair.txt format."""
    f.write(f"{int(len(pair_list))}\n")
    for idi, list_vals in enumerate(pair_list):
        f.write(f"{idi}\n")
        line = f"{len(list_vals)} " + " ".join(
            f"{cam_id} 1" for cam_id in list_vals)
        f.write(line + "\n")
