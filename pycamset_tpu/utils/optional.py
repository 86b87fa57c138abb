"""Validated importers for optional heavy dependencies.

pyvista is absent from this environment, and test oracles may transiently
install permissive stub modules under its name. Every product-code gate goes
through :func:`import_pyvista`, which refuses to hand back anything that does
not look like the real library — a counterfeit module raises ``ImportError``
exactly as a missing one does, so callers fall back to their matplotlib /
:class:`~pycamset_tpu.models.camera.SimpleMesh` paths instead of silently
producing garbage meshes.

Reference parity: the upstream code imports pyvista unconditionally
(pyCamSet/cameras/camera_set.py:436-582); here it is an optional, validated
extra.
"""
from __future__ import annotations


def import_pyvista():
    """Import and validate pyvista; raise ``ImportError`` when absent or fake.

    Validation is structural: the real library exposes ``PolyData`` and
    ``Plotter`` as classes and carries a ``__version__`` string. Permissive
    attribute-factory stubs fail all three checks.
    """
    import pyvista as pv

    poly = getattr(pv, "PolyData", None)
    plotter = getattr(pv, "Plotter", None)
    version = getattr(pv, "__version__", None)
    if not (isinstance(poly, type) and isinstance(plotter, type)
            and isinstance(version, str)):
        raise ImportError(
            "module named 'pyvista' does not look like the real library "
            "(missing PolyData/Plotter classes or __version__)")
    return pv
