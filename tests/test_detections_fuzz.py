"""Fuzz TargetDetection's relational ops against slow pure-Python oracles.

The detection table is the data backbone of the whole pipeline (reference:
calibration_targets/target_detections.py); every downstream consumer assumes
these ops are exact. Random tables (ragged visibility, duplicate rows,
multi-column keys, unsorted input) are compared row-for-row against naive
list-comprehension implementations.
"""
import numpy as np
import pytest

from pycamset_tpu.models.detections import ImageDetection, TargetDetection


def random_table(rng, n_cams, n_ims, key_dims):
    n = int(rng.integers(0, 200))
    if n == 0:
        return None
    cols = [rng.integers(0, n_cams, size=n), rng.integers(0, n_ims, size=n)]
    for d in key_dims:
        cols.append(rng.integers(0, d, size=n))
    cols.append(rng.uniform(0, 1600, size=n))
    cols.append(rng.uniform(0, 1200, size=n))
    return np.column_stack(cols).astype(float)


CASES = [(s, c, i, kd) for s in range(8)
         for c, i, kd in [(3, 5, (7,)), (1, 2, (3, 4)), (5, 8, (2, 3))]]


@pytest.mark.parametrize("seed,n_cams,n_ims,key_dims", CASES)
def test_relational_ops_match_oracle(seed, n_cams, n_ims, key_dims):
    rng = np.random.default_rng(seed)
    data = random_table(rng, n_cams, n_ims, key_dims)
    names = [f"c{i}" for i in range(n_cams)]
    det = TargetDetection(names, data, max_ims=n_ims)
    if data is None:
        assert not det.has_data()
        return
    rows = [tuple(r) for r in data]

    # get(cam=...) preserves order and picks exactly the matching rows
    for ci, name in enumerate(names):
        want = [r for r in rows if int(r[0]) == ci]
        got = det.get(cam=name).get_data()
        got = [] if got is None else [tuple(r) for r in got]
        assert got == want, f"cam {name}"

    # get(im_num=...)
    for i in range(n_ims):
        want = [r for r in rows if int(r[1]) == i]
        got = det.get(im_num=i).get_data()
        got = [] if got is None else [tuple(r) for r in got]
        assert got == want, f"im {i}"

    # get(key=...) with a -1 wildcard in the first key column
    k = len(key_dims)
    probe = data[int(rng.integers(0, len(rows))), 2:2 + k].copy()
    want = [r for r in rows if all(r[2 + j] == probe[j] for j in range(k))]
    got = [tuple(r) for r in det.get(key=probe).get_data()]
    assert got == want
    if k > 1:
        wild = probe.copy()
        wild[0] = -1
        want = [r for r in rows
                if all(r[2 + j] == wild[j] for j in range(1, k))]
        got = [tuple(r) for r in det.get(key=wild).get_data()]
        assert got == want

    # delete_row(im_num=[...]) is the exact complement
    drop = list(rng.choice(n_ims, size=min(2, n_ims), replace=False))
    want = [r for r in rows if int(r[1]) not in drop]
    out = det.delete_row(im_num=drop).get_data()
    got = [] if out is None else [tuple(r) for r in out]
    assert got == want

    # sort is a stable lexsort by (cam, im, flattened key)
    def flatkey(r):
        return int(np.ravel_multi_index(
            tuple(int(v) for v in r[2:2 + k]), key_dims))

    want = sorted(rows, key=lambda r: (r[0], r[1], flatkey(r)))
    got = [tuple(r) for r in det.sort(["cam", "im_num", "key"]).get_data()]
    assert got == want

    # return_flattened_keys == numpy ravel_multi_index
    flat = det.return_flattened_keys(key_dims).get_data()
    assert flat.shape[1] == 5
    want_flat = [flatkey(r) for r in rows]
    assert [int(v) for v in flat[:, 2]] == want_flat
    assert np.array_equal(flat[:, :2], data[:, :2])
    assert np.array_equal(flat[:, -2:], data[:, -2:])

    # features_per_im_per_cam is a plain 2-D histogram
    counts = det.features_per_im_per_cam()
    for i in range(n_ims):
        for c in range(n_cams):
            want_n = sum(1 for r in rows
                         if int(r[1]) == i and int(r[0]) == c)
            assert counts[i, c] == want_n


@pytest.mark.parametrize("seed", range(4))
def test_add_detection_buffer_and_concat(seed):
    rng = np.random.default_rng(100 + seed)
    names = ["a", "b"]
    det = TargetDetection(names)
    expect = []
    for im in range(4):
        for ci, name in enumerate(names):
            n = int(rng.integers(0, 6))
            if n == 0:
                continue
            keys = rng.integers(0, 9, size=n)
            pts = rng.uniform(0, 100, size=(n, 2))
            det.add_detection(name, im, ImageDetection(keys, pts))
            for kk, p in zip(keys, pts):
                expect.append((float(ci), float(im), float(kk), p[0], p[1]))
    if not expect:
        assert not det.has_data()
        return
    got = [tuple(r) for r in det.get_data()]
    assert got == expect
    assert det.max_ims == int(max(r[1] for r in expect)) + 1

    # __add__ concatenates and keeps the larger image range
    other = TargetDetection(names, np.array([[0.0, 9.0, 1.0, 5.0, 5.0]]))
    both = det + other
    assert both.max_ims == 10
    assert len(both.get_data()) == len(expect) + 1


@pytest.mark.parametrize("seed", range(4))
def test_reconstructable_matches_oracle(seed):
    rng = np.random.default_rng(200 + seed)
    data = random_table(rng, 4, 5, (6,))
    if data is None:
        return
    # dedupe (cam, im, key) triplets: duplicates inflate view counts
    data = data[np.unique(data[:, :3], axis=0, return_index=True)[1]]
    det = TargetDetection([f"c{i}" for i in range(4)], data, max_ims=5)
    (feature_inds, im_dst, per_feature_count,
     recon) = det.parse_detections_to_reconstructable()

    # oracle: a (key, im) observation is viable when >= 2 cameras saw that
    # key in that image; per-feature count = #images with a viable sighting
    views = {}
    for r in data:
        views.setdefault((int(r[2]), int(r[1])), set()).add(int(r[0]))
    viable = {ki for ki, cams in views.items() if len(cams) > 1}
    want_rows = sorted(
        [tuple(r) for r in data if (int(r[2]), int(r[1])) in viable],
        key=lambda r: (r[2], r[1], r[0]))
    got_rows = sorted([tuple(r) for r in recon],
                      key=lambda r: (r[2], r[1], r[0]))
    assert got_rows == want_rows

    want_count = {}
    for (kk, im) in viable:
        want_count[kk] = want_count.get(kk, 0) + 1
    keys_sorted = sorted(want_count)
    assert list(per_feature_count) == [want_count[kk] for kk in keys_sorted]


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
