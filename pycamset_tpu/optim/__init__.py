"""Bundle-adjustment optimisation: blocks, chains, LM solver, handlers."""
from pycamset_tpu.optim.blocks import (
    Extrinsic3D, FreePoint, FunctionBlock, ParamSpec, Projection,
    RigidTform3d, TemplatePoints, key_type)
from pycamset_tpu.optim.chain import OptimFunction, ParamStruct
from pycamset_tpu.optim.lm import LMResult, lm_solve, lm_solve_masked
from pycamset_tpu.optim.handlers import (
    DEFAULT_OPTIONS, FreePointBundleHandler, FreePointTarget,
    SelfBundleHandler, TemplateBundleHandler, estimate_camera_relative_poses)
from pycamset_tpu.optim.driver import (
    make_optimisation_function, run_bundle_adjustment)
from pycamset_tpu.optim.uncertainty import (
    calibration_uncertainty, parameter_covariance)

__all__ = [
    "FunctionBlock", "ParamSpec", "key_type", "Projection", "RigidTform3d",
    "Extrinsic3D", "TemplatePoints", "FreePoint", "OptimFunction",
    "ParamStruct", "LMResult", "lm_solve", "lm_solve_masked",
    "DEFAULT_OPTIONS", "TemplateBundleHandler", "SelfBundleHandler",
    "FreePointBundleHandler", "FreePointTarget",
    "estimate_camera_relative_poses", "make_optimisation_function",
    "run_bundle_adjustment", "calibration_uncertainty",
    "parameter_covariance",
]
