"""Counterfeit-dependency hardening.

Round-3 judge finding: a test oracle leaked a permissive ``pyvista`` stub
into ``sys.modules`` and product code trusted it, producing garbage meshes
instead of the SimpleMesh fallback. These tests install a counterfeit on
purpose and assert every gate refuses it — and that the oracle importer no
longer leaks its stubs.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest


class _Any:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return _Any()

    def __getattr__(self, name):
        return _Any()


class _FakePyvista(types.ModuleType):
    """Attribute-factory stub like the one the oracle used to leak."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _Any()


@pytest.fixture
def counterfeit_pyvista():
    saved = sys.modules.get("pyvista")
    sys.modules["pyvista"] = _FakePyvista("pyvista")
    try:
        yield
    finally:
        if saved is None:
            sys.modules.pop("pyvista", None)
        else:
            sys.modules["pyvista"] = saved


def test_import_pyvista_rejects_counterfeit(counterfeit_pyvista):
    from pycamset_tpu.utils.optional import import_pyvista
    with pytest.raises(ImportError):
        import_pyvista()


def test_camera_mesh_falls_back_to_simplemesh(counterfeit_pyvista):
    from pycamset_tpu.models.camera import Camera, SimpleMesh
    mesh = Camera().get_mesh()
    assert isinstance(mesh, SimpleMesh)
    assert np.asarray(mesh.points).ndim == 2


def test_point_cloud_falls_back_to_ndarray(counterfeit_pyvista):
    from pycamset_tpu.reconstruction.reconstruction_utils import _as_cloud
    pts = np.random.default_rng(0).normal(size=(10, 3))
    cloud = _as_cloud(pts, scalars=np.arange(10.0))
    assert isinstance(cloud, np.ndarray)
    np.testing.assert_array_equal(cloud, pts)


def test_scene_raises_importerror_not_garbage(counterfeit_pyvista):
    from pycamset_tpu.models.camera import Camera
    from pycamset_tpu.models.camera_set import CameraSet
    cams = CameraSet(camera_dict={"c0": Camera(name="c0"),
                                  "c1": Camera(name="c1")})
    with pytest.raises(ImportError):
        cams.get_scene()


def test_ref_oracle_stubs_do_not_leak():
    pre = {n for n in ("pyvista", "numba", "blosc", "natsort")
           if n in sys.modules}
    from ref_oracle import import_reference
    mod = import_reference("pyCamSet.optimisation.compiled_helpers")
    assert mod is not None
    post = {n for n in ("pyvista", "numba", "blosc", "natsort")
            if n in sys.modules}
    assert post == pre, f"oracle leaked stub modules: {post - pre}"
