"""resolve_fused_grams / resolve_mixed_grams_fused dispatch policy.

Pure policy tests (no kernels execute — the builders only construct
closures): family selection per chain, the per-family image-padding
thresholds, the PYCAMSET_FUSED_* env overrides, and the backend gate.
"""
import jax
import pytest

from pycamset_tpu.optim.blocks import (Extrinsic3D, FreePoint,
                                       GroupRigidTform3d, GroupTemplatePoints,
                                       Projection, RigidTform3d,
                                       TemplatePoints)
from pycamset_tpu.optim.chain import OptimFunction
from pycamset_tpu.optim.structured import chain_widths, resolve_fused_grams
from pycamset_tpu.optim.structured_mixed import (mixed_chain_widths,
                                                 resolve_mixed_grams_fused)


class _JaxTPUProxy:
    def __getattr__(self, name):
        return getattr(jax, name)

    @staticmethod
    def default_backend():
        return "tpu"


@pytest.fixture
def tpu_backend(monkeypatch):
    import pycamset_tpu.optim.structured as structured
    import pycamset_tpu.optim.structured_mixed as structured_mixed

    proxy = _JaxTPUProxy()
    monkeypatch.setattr(structured, "jax", proxy)
    monkeypatch.setattr(structured_mixed, "jax", proxy)
    return monkeypatch


def _chain(blocks):
    op_fun = OptimFunction(blocks)
    return op_fun, chain_widths(op_fun)


def test_cpu_backend_never_fuses():
    op_fun, widths = _chain([Projection(), Extrinsic3D(), TemplatePoints()])
    assert resolve_fused_grams(op_fun, widths, 4, 16) is None


def test_template_policy_five_percent(tpu_backend):
    op_fun, widths = _chain([Projection(), Extrinsic3D(), TemplatePoints()])
    got = resolve_fused_grams(op_fun, widths, 4, 16)   # pad 0% of tile 16
    assert got is not None and got[0] == "template"
    # 100 images pad to 112 (12% > the 5% threshold): declined
    assert resolve_fused_grams(op_fun, widths, 4, 100) is None
    tpu_backend.setenv("PYCAMSET_FUSED_TEMPLATE", "1")
    got = resolve_fused_grams(op_fun, widths, 4, 100)
    assert got is not None and got[0] == "template"
    tpu_backend.setenv("PYCAMSET_FUSED_TEMPLATE", "0")
    assert resolve_fused_grams(op_fun, widths, 4, 16) is None


def test_selfcal_policy_prefers_lower_padding_tile(tpu_backend):
    op_fun, widths = _chain([Projection(), Extrinsic3D(), RigidTform3d(),
                             FreePoint()])
    # 100 images: tile 8 pads to 104 (4% <= 25%) — fused
    got = resolve_fused_grams(op_fun, widths, 4, 100)
    assert got is not None and got[0] == "selfcal"
    # 5 images: tile 8 pads to 8 (60% > 25%) — declined
    assert resolve_fused_grams(op_fun, widths, 4, 5) is None
    tpu_backend.setenv("PYCAMSET_FUSED_SELFCAL", "1")
    got = resolve_fused_grams(op_fun, widths, 4, 5)
    assert got is not None and got[0] == "selfcal"


def test_freepoint_and_grouped_families(tpu_backend):
    op_fun, widths = _chain([Projection(), Extrinsic3D(), FreePoint()])
    got = resolve_fused_grams(op_fun, widths, 4, 8)
    assert got is not None and got[0] == "freepoint"

    op_fun, widths = _chain([Projection(), Extrinsic3D(), RigidTform3d(),
                             GroupTemplatePoints()])
    got = resolve_fused_grams(op_fun, widths, 4, 8)
    assert got is not None and got[0] == "grouped"
    assert resolve_fused_grams(op_fun, widths, 4, 5) is None  # 60% pad


def test_no_pallas_env_disables_all(tpu_backend):
    tpu_backend.setenv("PYCAMSET_NO_PALLAS", "1")
    op_fun, widths = _chain([Projection(), Extrinsic3D(), TemplatePoints()])
    assert resolve_fused_grams(op_fun, widths, 4, 16) is None


def test_mixed_policy(tpu_backend):
    op_fun = OptimFunction([Projection(), Extrinsic3D(), RigidTform3d(),
                            GroupRigidTform3d(), FreePoint()])
    widths = mixed_chain_widths(op_fun)
    assert resolve_mixed_grams_fused(op_fun, widths, 4, 8) is not None
    assert resolve_mixed_grams_fused(op_fun, widths, 4, 5) is None
    tpu_backend.setenv("PYCAMSET_FUSED_MIXED", "1")
    assert resolve_mixed_grams_fused(op_fun, widths, 4, 5) is not None
    tpu_backend.setenv("PYCAMSET_FUSED_MIXED", "0")
    assert resolve_mixed_grams_fused(op_fun, widths, 4, 8) is None
