"""TargetDetection: the central relational table of feature observations.

Capability parity target (reference, behaviour only):
pyCamSet/calibration_targets/target_detections.py — rows
[cam_idx, im_num, key..., u, v] with variable-length multi-dim keys, buffered
appends, relational gets by cam/key/im_num, sorting, key flattening, per-image
feature counts and reconstructability analysis.

This implementation keeps the same row layout (it is the direct input to the
device-side residual gathers) but performs all relational operations as
vectorised numpy — no per-row Python loops.
"""
from __future__ import annotations

from copy import copy
from functools import reduce

import numpy as np


class ImageDetection:
    """Keys + image points found in one image; both or neither must be given."""

    def __init__(self, keys=None, image_points=None):
        keys = np.array([] if keys is None else keys)
        image_points = np.array([] if image_points is None else image_points)
        kp = keys.size != 0
        ip = image_points.size != 0
        if kp and ip:
            if len(keys) != len(image_points):
                raise ValueError(
                    "Detected keys must be the same length as detected points")
            self.keys = keys
            self.image_points = image_points
            self.has_data = True
            self.data_len = len(keys)
        elif not kp and not ip:
            self.has_data = False
        else:
            raise ValueError(
                "A detection requires both identifying keys and detected image points.")


class TargetDetection:
    """Stores which camera saw which feature in which image.

    Data layout per row: | cam | im_num | key ... | u | v |  (key is variable
    length; cam is the index into the camera-name list).
    """

    def __init__(self, cam_names: list, data: np.ndarray | None = None, max_ims: int = 0):
        self.cam_names = list(cam_names)
        if len(set(self.cam_names)) != len(self.cam_names):
            raise ValueError("input camera names must be unique")
        self._data = copy(data)
        self._update_buffer: list = []
        self._max_ims = int(max_ims)
        self._glomp_buffer()

    # ------------------------------------------------------------ properties

    @property
    def max_ims(self) -> int:
        self._glomp_buffer()  # buffered appends count towards the image range
        if self._data is not None and self._data.shape[0]:
            self._max_ims = max(int(np.max(self._data[:, 1])) + 1, self._max_ims)
        return self._max_ims

    @max_ims.setter
    def max_ims(self, val):
        self._max_ims = int(val)

    def has_data(self) -> bool:
        self._glomp_buffer()
        return self._data is not None

    def get_data(self) -> np.ndarray | None:
        self._glomp_buffer()
        return self._data

    # ---------------------------------------------------------------- writes

    def add_detection(self, cam_name, im_num, detection: ImageDetection) -> None:
        """Append one image's detection to the internal buffer."""
        ind = self.cam_names.index(cam_name)
        if detection.has_data:
            keys = detection.keys
            if keys.ndim == 1:
                keys = keys[..., None]
            obs = np.concatenate(
                [np.full((detection.data_len, 1), ind, dtype=float),
                 np.full((detection.data_len, 1), im_num, dtype=float),
                 keys.astype(float), detection.image_points], axis=1)
            self._update_buffer.append(obs)

    def _glomp_buffer(self) -> None:
        if self._update_buffer:
            chunk = np.concatenate(self._update_buffer, axis=0)
            self._data = (chunk if self._data is None
                          else np.concatenate([self._data, chunk], axis=0))
            self._max_ims = max(self._max_ims, int(np.amax(self._data[:, 1])) + 1)
            self._update_buffer.clear()

    def __add__(self, other: "TargetDetection") -> "TargetDetection":
        if self.cam_names != other.cam_names:
            raise ValueError("To add detections, they must have consistent camera names")
        self._glomp_buffer()
        other._glomp_buffer()
        parts = [d for d in (self._data, other._data)
                 if d is not None and d.shape[0]]
        if not parts:
            return self
        new = TargetDetection(self.cam_names, np.concatenate(parts, axis=0)
                              if len(parts) > 1 else parts[0])
        new.max_ims = max(self.max_ims, other.max_ims)
        return new

    # ----------------------------------------------------------------- reads

    def _mask_for(self, key: str, target) -> np.ndarray:
        if key == "cam":
            return np.isclose(self._data[:, 0], self.cam_names.index(target))
        if key == "im_num":
            return np.isclose(self._data[:, 1], target)
        if key == "key":
            target = np.atleast_1d(target)
            masks = [np.isclose(self._data[:, 2 + i], k)
                     for i, k in enumerate(target) if not np.isclose(k, -1)]
            return reduce(np.logical_and, masks)
        if key == "index":
            mask = np.zeros(self._data.shape[0], dtype=bool)
            mask[target] = True
            return mask
        raise ValueError(f'{key} is not a gettable item: accepted are '
                         f'"cam", "key", "im_num" or "index"')

    def get(self, **direction) -> "TargetDetection":
        """Subset of detections by cam=<name>, key=<key>, or im_num=<int>."""
        self._glomp_buffer()
        if len(direction) > 1:
            raise ValueError("Can only get one item at a time")
        key, target = next(iter(direction.items()))
        if key not in ("cam", "key", "im_num"):
            raise ValueError(f'{key} is not a gettable item: accepted are '
                             f'"cam", "key", or "im_num"')
        if self._data is None:
            return TargetDetection(cam_names=self.cam_names, data=None,
                                   max_ims=self.max_ims)
        data = self._data[self._mask_for(key, target), :]
        if data.shape[0] == 0:
            data = None
        return TargetDetection(cam_names=self.cam_names, data=data, max_ims=self.max_ims)

    def delete_row(self, **direction) -> "TargetDetection":
        """Detection without the rows matching cam/key/im_num/index values."""
        self._glomp_buffer()
        if len(direction) > 1:
            raise ValueError("Can only get one item at a time")
        key, target = next(iter(direction.items()))
        if not isinstance(target, (list, np.ndarray)):
            target = [target]
        mask = reduce(np.logical_or, [self._mask_for(key, t) for t in target])
        return TargetDetection(cam_names=self.cam_names, max_ims=self.max_ims,
                               data=self._data[~mask])

    def delete_col(self, col_id) -> "TargetDetection":
        return TargetDetection(cam_names=self.cam_names, max_ims=self.max_ims,
                               data=np.delete(self.get_data(), col_id, axis=1))

    def get_cam_list(self) -> list["TargetDetection"]:
        return [self.get(cam=name) for name in self.cam_names]

    def get_image_list(self) -> list["TargetDetection"]:
        return [self.get(im_num=i) for i in range(int(self.max_ims))]

    def get_key_list(self) -> list["TargetDetection"]:
        unique_keys = np.unique(self.get_data()[:, 2:-2], axis=0)
        return [self.get(key=k) for k in unique_keys]

    # ------------------------------------------------------------- reshaping

    def sort(self, keys_to_sort, inplace: bool = False):
        """Lexsort by any of 'cam', 'im_num', 'key' (list order = priority)."""
        if not isinstance(keys_to_sort, list):
            keys_to_sort = [keys_to_sort]
        data = self.get_data()
        lex_target = []
        for item in keys_to_sort[::-1]:
            if item == "cam":
                lex_target.append(data[:, 0])
            elif item == "im_num":
                lex_target.append(data[:, 1])
            elif item == "key":
                if data.shape[1] == 5:
                    lex_target.append(data[:, 2])
                else:
                    hi = np.amax(data[:, 2:-2], axis=0) + 1
                    factor = np.append(np.cumprod(hi[::-1])[::-1], 1)
                    lex_target.append(np.sum(factor[1:] * data[:, 2:-2], axis=1))
            else:
                raise ValueError(f"{item} is not an accepted sort key.\n"
                                 "Accepted keys are: 'cam', 'key', or 'im_num'")
        new_data = data[np.lexsort(lex_target)]
        if not inplace:
            return TargetDetection(self.cam_names, new_data, self.max_ims)
        self._data = new_data
        return None

    def return_flattened_keys(self, keydims) -> "TargetDetection":
        """Flatten multi-dim keys into a single ravel index (numpy order)."""
        data = self.get_data()
        if data.shape[1] == 5:
            return self
        data = data.copy()
        padded = np.append(np.asarray(keydims)[1:], 1)
        prods = np.cumprod(padded[::-1])[::-1]
        flat = np.sum(data[:, 2:-2] * prods, axis=1).reshape((-1, 1))
        new_data = np.concatenate([data[:, :2], flat, data[:, -2:]], axis=1)
        return TargetDetection(self.cam_names, new_data, self.max_ims)

    # ------------------------------------------------------------- analytics

    def features_per_im_per_cam(self) -> np.ndarray:
        """(n_ims, n_cams) count of detected features."""
        data = self.get_data()
        n_cams = len(self.cam_names)
        n_ims = int(self.max_ims)
        block = np.zeros((n_ims, n_cams))
        np.add.at(block, (data[:, 1].astype(int), data[:, 0].astype(int)), 1)
        return block

    def parse_detections_to_reconstructable(self, draw_distribution: bool = False):
        """Identify features triangulable (seen >=2x) at each time point.

        :return feature_inds: start index per feature into the viable subset.
        :return im_dst: per-feature, per-image observation counts.
        :return per_feature_count: images in which each feature is visible.
        :return reconstructable_data: the viable subset of the data table.
        """
        data = self.sort(["key", "im_num"]).get_data()
        _, unique_key_inv, per_feature_count = np.unique(
            data[:, 1:-2], axis=0, return_inverse=True, return_counts=True)
        viable_mask = per_feature_count > 1
        data_recon_subset = data[viable_mask[unique_key_inv]]

        _, task_start_index, task_count = np.unique(
            data_recon_subset[:, 1:-2], axis=0, return_index=True, return_counts=True)
        sorted_task_count = task_count[np.argsort(task_start_index)]
        task_start_points = np.append(0, np.cumsum(sorted_task_count))

        _, feature_index = np.unique(data_recon_subset[:, 2:-2], axis=0,
                                     return_index=True)
        feature_inds = np.append(np.sort(feature_index), data_recon_subset.shape[0])
        im_dst = np.zeros((len(feature_inds) - 1, self.max_ims))
        idx = 0
        for i in range(len(feature_inds) - 1):
            j = 0
            while task_start_points[idx] < feature_inds[i + 1]:
                im_dst[i, j] = sorted_task_count[idx]
                idx += 1
                j += 1
        per_feature_count = np.sum(im_dst > 0, axis=1)

        if draw_distribution:
            from matplotlib import pyplot as plt
            fig, ax = plt.subplots(1, 2)
            ax[0].imshow(im_dst)
            ax[0].set_title("Feature visibility in cameras")
            ax[1].plot(per_feature_count, ".")
            ax[1].set_title("number visible images.")
            plt.show()

        return feature_inds, im_dst, per_feature_count, data_recon_subset
