"""Property-style tests for the TargetDetection relational table."""
import numpy as np
import pytest

from pycamset_tpu.models.detections import ImageDetection, TargetDetection

RNG = np.random.default_rng(41)


def random_table(n=400, n_cams=4, n_ims=6, keydims=(3, 7)):
    cams = RNG.integers(0, n_cams, n)
    ims = RNG.integers(0, n_ims, n)
    keys = np.stack([RNG.integers(0, d, n) for d in keydims], axis=1)
    uv = RNG.uniform(0, 1000, (n, 2))
    data = np.column_stack([cams, ims, keys, uv]).astype(float)
    return TargetDetection(cam_names=[f"c{i}" for i in range(n_cams)],
                           data=data)


class TestRelationalOps:
    def test_get_partitions_by_cam(self):
        det = random_table()
        parts = det.get_cam_list()
        total = sum(p.get_data().shape[0] for p in parts if p.get_data() is not None)
        assert total == det.get_data().shape[0]
        for i, p in enumerate(parts):
            d = p.get_data()
            if d is not None:
                assert np.all(d[:, 0] == i)

    def test_get_image_partitions(self):
        det = random_table()
        parts = det.get_image_list()
        total = sum(p.get_data().shape[0] for p in parts if p.get_data() is not None)
        assert total == det.get_data().shape[0]

    def test_delete_row_complements_get(self):
        det = random_table()
        kept = det.delete_row(im_num=2)
        grabbed = det.get(im_num=2)
        assert (kept.get_data().shape[0] + grabbed.get_data().shape[0]
                == det.get_data().shape[0])
        assert not np.any(kept.get_data()[:, 1] == 2)

    def test_sort_is_stable_permutation(self):
        det = random_table()
        for keys in (["cam"], ["im_num"], ["key"], ["cam", "im_num", "key"]):
            s = det.sort(list(keys))
            a = np.sort(det.get_data(), axis=0)
            b = np.sort(s.get_data(), axis=0)
            np.testing.assert_allclose(a, b)  # same multiset of rows
        s = det.sort(["cam", "im_num"]).get_data()
        assert np.all(np.diff(s[:, 0]) >= 0)

    def test_flatten_keys_bijective(self):
        keydims = (3, 7)
        det = random_table(keydims=keydims)
        flat = det.return_flattened_keys(keydims)
        raw = det.get_data()
        fl = flat.get_data()
        expect = raw[:, 2] * keydims[1] + raw[:, 3]
        np.testing.assert_allclose(fl[:, 2], expect)
        assert fl.shape[1] == 5

    def test_add_concatenates(self):
        a, b = random_table(100), random_table(50)
        b.cam_names = a.cam_names
        merged = a + b
        assert merged.get_data().shape[0] == 150

    def test_add_detection_buffering(self):
        det = TargetDetection(cam_names=["x", "y"])
        det.add_detection("x", 0, ImageDetection([1, 2], [[10., 20], [30, 40]]))
        det.add_detection("y", 1, ImageDetection([3], [[50., 60]]))
        data = det.get_data()
        assert data.shape == (3, 5)  # [cam, im, key, u, v]
        assert det.max_ims == 2

    def test_features_per_im_per_cam_counts(self):
        det = random_table()
        block = det.features_per_im_per_cam()
        assert block.sum() == det.get_data().shape[0]

    def test_reconstructable_subset(self):
        det = random_table(n=600)
        f_inds, im_dst, counts, subset = det.parse_detections_to_reconstructable()
        # every surviving (im, key) group is seen by >= 2 cameras
        _, inv, c = np.unique(subset[:, 1:-2], axis=0,
                              return_inverse=True, return_counts=True)
        assert np.all(c > 1)

    def test_unique_names_required(self):
        with pytest.raises(ValueError):
            TargetDetection(cam_names=["a", "a"])


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
