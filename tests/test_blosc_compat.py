"""The reference `.camset` blosc decode path (utils/blosc_compat.py).

The reference compresses arrays with blosc lz4+shuffle
(/root/reference/pyCamSet/utils/saving.py:240-332); this environment has no
python-blosc, so the repo ships a ctypes binding of the system libblosc plus
a pure-Python frame reader. The system library doubles as the test oracle:
every frame here is produced by real c-blosc.
"""
import base64
import json

import numpy as np
import pytest

from pycamset_tpu.utils import blosc_compat as bc

pytestmark = pytest.mark.skipif(
    not bc.native_blosc_available(),
    reason="system libblosc not present to act as the oracle")


def _cases():
    rng = np.random.default_rng(7)
    return [
        np.arange(10000, dtype=np.float64),          # highly compressible
        rng.normal(size=(321, 7)),                   # incompressible -> raw
        rng.integers(0, 50, 300000).astype(float),   # multi-block
        np.zeros(5),                                 # tiny
    ]


@pytest.mark.parametrize("cname", [b"lz4", b"zlib"])
@pytest.mark.parametrize("shuffle", [0, 1])
def test_pure_reader_matches_native(cname, shuffle):
    for arr in _cases():
        raw = arr.tobytes()
        frame = bc.blosc_compress_native(raw, arr.dtype.itemsize,
                                         clevel=3, cname=cname,
                                         shuffle=shuffle)
        assert bc.blosc_decompress_native(frame) == raw
        assert bc.blosc_decompress_pure(frame) == raw


def test_lz4_known_vector():
    # token 0x54: 5 literals then a 4+4-byte match at offset 5 -> "hello" * ~2
    src = bytes([0x54]) + b"hello" + bytes([0x05, 0x00])
    assert bc.lz4_block_decompress(src, 13) == b"hellohellohel"


def test_memcpy_frame():
    # incompressible bytes land in a verbatim (memcpy) frame
    rng = np.random.default_rng(3)
    raw = rng.bytes(4096)
    frame = bc.blosc_compress_native(raw, 1, clevel=9, cname=b"lz4", shuffle=0)
    assert bc.blosc_decompress_pure(frame) == raw


def _reference_chunked_dict(arr: np.ndarray, max_num: int | None = None):
    """Re-create the reference's chunked compress() layout
    (ref utils/saving.py:240-293) using real blosc frames."""
    flat = np.ascontiguousarray(arr).reshape(-1)
    if max_num is None:
        max_num = 100_000_000 // flat.dtype.itemsize
    n_chunks = max(1, -(-flat.size // max_num))
    payloads, sizes = [], []
    for ci in range(n_chunks):
        piece = flat[ci * max_num:(ci + 1) * max_num].tobytes()
        frame = bc.blosc_compress_native(piece, flat.dtype.itemsize,
                                         clevel=3, cname=b"lz4", shuffle=1)
        payloads.append(base64.b64encode(frame).decode())
        sizes.append(len(frame))
    return {"shape": list(arr.shape), "size": flat.size,
            "dtype": str(flat.dtype), "f": False, "num_chunk": n_chunks,
            "max_num": max_num, "data": payloads, "sizes": sizes}


def test_reference_chunked_dict_roundtrip():
    arr = np.random.default_rng(0).normal(size=(400, 5))
    for max_num in (None, 512):  # single- and multi-chunk
        out = bc.decompress_reference_dict(_reference_chunked_dict(arr, max_num))
        np.testing.assert_array_equal(out, arr)


def test_reference_written_camset_loads_fully(tmp_path):
    """A .camset in the REFERENCE's on-disk dialect (pyCamSet module names,
    blosc-chunked arrays) must load including the detection table."""
    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import FreePointTarget, TemplateBundleHandler
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.saving import load_CameraSet, save_camset
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    rig = make_synthetic_rig(n_cams=2, n_ims=3, grid=4, visibility=1.0,
                             noise_px=0.0, seed=1)
    k_mats = [np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]])
              for i9 in rig["intr"]]
    exts = [make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]]
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b"], exts, k_mats, [i9[4:] for i9 in rig["intr"]],
        [[1600, 1200]] * 2))
    det = TargetDetection(cam_names=["a", "b"], data=rig["dd"])
    handler = TemplateBundleHandler(
        cams, FreePointTarget(rig["template"].reshape(1, -1, 3)), det,
        options={"outliers": "n"})
    x0 = handler.get_initial_params()
    cams.set_calibration_history(
        {"x": x0, "fun": np.zeros(2 * det.get_data().shape[0])}, handler)

    ours = tmp_path / "ours.camset"
    save_camset(cams, ours)
    doc = json.loads(ours.read_text())

    # rewrite in the reference dialect: its module names, its array encoding
    doc["optim"]["dtct_config"]["dtct_module"] = (
        "pyCamSet.calibration_targets.target_detections")
    doc["cam_config"]["camset_module"] = "pyCamSet.cameras.camera_set"
    doc["optim"]["handler_config"]["handler_module"] = (
        "pyCamSet.optimisation.template_handler")
    doc["optim"]["dtct_config"]["compressed_data"] = (
        _reference_chunked_dict(det.get_data()))
    doc["optim"]["results"] = _reference_chunked_dict(
        np.asarray(cams.calibration_result))

    theirs = tmp_path / "reference_dialect.camset"
    theirs.write_text(json.dumps(doc))

    loaded = load_CameraSet(theirs)
    assert loaded.calibration_handler is not None, (
        "reference-dialect file degraded to a bare CameraSet")
    np.testing.assert_allclose(
        loaded.calibration_handler.detection.get_data(), det.get_data())
    np.testing.assert_allclose(loaded.calibration_params, np.asarray(x0))
    assert loaded == cams


def test_pure_reader_never_crashes_on_corruption():
    """Truncated/bit-flipped frames must raise BloscDecodeError (the
    documented contract), never IndexError/struct.error."""
    rng = np.random.default_rng(11)
    arr = np.arange(4096, dtype=np.float64)
    frame = bytearray(bc.blosc_compress_native(arr.tobytes(), 8, 5, b"lz4", 1))
    for trial in range(200):
        bad = bytearray(frame)
        mode = trial % 3
        if mode == 0:                      # truncate
            bad = bad[:rng.integers(1, len(bad))]
        elif mode == 1:                    # flip random bytes
            for _ in range(rng.integers(1, 8)):
                bad[rng.integers(0, len(bad))] = rng.integers(0, 256)
        else:                              # garble the header
            for i in rng.integers(0, bc.HEADER_LEN, size=4):
                bad[i] = rng.integers(0, 256)
        try:
            out = bc.blosc_decompress_pure(bytes(bad))
            assert isinstance(out, bytes)  # an accidental clean decode is ok
        except bc.BloscDecodeError:
            pass  # the contract: the ONLY acceptable failure mode


# ---------------------------------------------------------------- write side

def _write_cases():
    rng = np.random.default_rng(21)
    return [
        np.arange(10000, dtype=np.float64),            # compressible f64
        rng.normal(size=(321, 7)),                     # hard to compress
        rng.integers(0, 50, 400000).astype(np.float32),  # multi-block f32
        np.frombuffer(rng.bytes(4097), dtype=np.uint8),  # typesize 1
        np.array([], dtype=np.float64),                # empty
        np.arange(37, dtype=np.int32),                 # odd count, int
    ]


def test_pure_writer_decodes_with_native_cblosc():
    """TRUE interop oracle: frames from the pure-Python zlib-codec writer
    decode byte-exactly through the system libblosc — the same C library
    the reference's python-blosc wraps."""
    for arr in _write_cases():
        raw = arr.tobytes()
        frame = bc.blosc_compress_pure(raw, max(arr.dtype.itemsize, 1))
        assert bc.blosc_decompress_native(frame) == raw
        assert bc.blosc_decompress_pure(frame) == raw


def test_native_writer_roundtrips_both_readers():
    for arr in _write_cases():
        raw = arr.tobytes()
        frame = bc.blosc_compress_frame(raw, max(arr.dtype.itemsize, 1))
        assert bc.blosc_decompress_native(frame) == raw
        assert bc.blosc_decompress_pure(frame) == raw


def test_compress_reference_dict_roundtrip():
    rng = np.random.default_rng(5)
    cases = [
        rng.normal(size=(400, 5)),
        np.asfortranarray(rng.normal(size=(64, 33))),   # F-order flag
        rng.integers(0, 9, 100000).astype(np.float64),
    ]
    for arr in cases:
        d = bc.compress_reference_dict(arr)
        out = bc.decompress_reference_dict(d)
        np.testing.assert_array_equal(out, arr)
        assert d["sizes"] == [len(base64.b64decode(c)) for c in d["data"]]
    # multi-chunk path via a tiny block budget
    arr = rng.normal(size=30000)
    d = bc.compress_reference_dict(arr, max_blk_size=8 * 4096)
    assert d["num_chunk"] > 1
    np.testing.assert_array_equal(bc.decompress_reference_dict(d), arr)


def test_repo_saved_camset_loads_in_reference(tmp_path):
    """Save with THIS package, load with the REFERENCE's load_CameraSet
    (imported from the mounted reference; its blosc calls run through the
    system libblosc) — the write-side interop oracle."""
    import sys
    from pathlib import Path as _P
    sys.path.insert(0, str(_P(__file__).parent))
    from ref_oracle import import_reference, reference_stubs

    from pycamset_tpu.models.camera_set import CameraSet, make_cam_dict
    from pycamset_tpu.models.detections import TargetDetection
    from pycamset_tpu.optim.handlers import (FreePointTarget,
                                             TemplateBundleHandler)
    from pycamset_tpu.utils.general_utils import make_4x4h_tform
    from pycamset_tpu.utils.saving import save_camset
    from pycamset_tpu.utils.synthetic import make_synthetic_rig

    from pycamset_tpu.models.charuco import ChArUco

    rig = make_synthetic_rig(n_cams=2, n_ims=3, grid=4, visibility=1.0,
                             noise_px=0.0, seed=2)
    k_mats = [np.array([[i9[0], 0, i9[1]], [0, i9[2], i9[3]], [0, 0, 1]])
              for i9 in rig["intr"]]
    exts = [make_4x4h_tform(e[:3], e[3:]) for e in rig["extr"]]
    cams = CameraSet(camera_dict=make_cam_dict(
        ["a", "b"], exts, k_mats, [i9[4:] for i9 in rig["intr"]],
        [[1600, 1200]] * 2))
    det = TargetDetection(cam_names=["a", "b"], data=rig["dd"])
    # ChArUco: scalar ctor args survive the reference's reflective rebuild
    # (FreePointTarget's ndarray input does not round-trip JSON on THEIR
    # side — a reference limitation, not an interop gap); 5x5 squares give
    # the same 16 inner corners as the rig's 4x4 grid
    target = ChArUco(5, 5, 4)
    handler = TemplateBundleHandler(cams, target, det,
                                    options={"outliers": "n"})
    x0 = handler.get_initial_params()
    cams.set_calibration_history(
        {"x": x0, "fun": np.zeros(2 * det.get_data().shape[0])}, handler)

    f = tmp_path / "ours.camset"
    save_camset(cams, f)

    ref_saving = import_reference("pyCamSet.utils.saving")
    with reference_stubs():  # reference handlers import lazily
        loaded = ref_saving.load_CameraSet(f)

    # camera geometry must round-trip exactly
    for name, cam in zip(["a", "b"], cams):
        ref_cam = loaded[name]
        np.testing.assert_allclose(ref_cam.intrinsic, cam.intrinsic)
        np.testing.assert_allclose(ref_cam.extrinsic, cam.extrinsic)
        np.testing.assert_allclose(ref_cam.distortion_coefs.ravel(),
                                   np.ravel(cam.distortion_coefs))
    # the calibration history must survive: blosc-compressed detection
    # table decoded by the reference's own decompress
    assert loaded.calibration_handler is not None, (
        "repo-saved file degraded to a bare CameraSet in the reference")
    np.testing.assert_allclose(
        loaded.calibration_handler.detection.get_data(), det.get_data())
    np.testing.assert_allclose(loaded.calibration_params, np.asarray(x0))
