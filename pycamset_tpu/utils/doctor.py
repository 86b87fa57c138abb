"""Environment and device self-test (``python -m pycamset_tpu doctor``).

A production rig lives or dies on its environment: the right OpenCV aruco
API, a working accelerator, the native blosc codec for ``.camset`` interop,
and the x64/matmul-precision configuration the solver depends on. This
module runs a battery of cheap checks and one tiny device solve, and
reports each as ``ok`` / ``warn`` / ``fail`` so a user (or CI job) can
validate a deployment in seconds.

The reference has no equivalent (failures surface as deep stack traces at
calibration time, e.g. the unconditional pyvista import at
pyCamSet/cameras/camera_set.py:436); this is beyond-reference surface.

Statuses: ``ok`` (works), ``warn`` (degraded but functional — e.g. the
pure-Python blosc fallback, or CPU-only compute), ``fail`` (the framework
will not work correctly), ``skip`` (check not requested). The overall
report is ``ok`` unless any check fails.
"""
from __future__ import annotations

import platform
import sys
import time

import numpy as np


def _entry(status: str, detail: str) -> dict:
    return {"status": status, "detail": detail}


# ------------------------------------------------------------------ checks

def check_versions() -> dict:
    """Interpreter and core dependency versions (informational)."""
    import cv2
    import jax
    import scipy

    detail = (f"python {platform.python_version()}, numpy "
              f"{np.__version__}, jax {jax.__version__}, cv2 "
              f"{cv2.__version__}, scipy {scipy.__version__}")
    return _entry("ok", detail)


def check_config() -> dict:
    """The two load-bearing jax config flags (see pycamset_tpu/config.py).

    x64 off breaks the LM solver's convergence contract; non-highest matmul
    precision degrades solves from ~5 to ~95 iterations on TPU.
    """
    import jax

    if not jax.config.jax_enable_x64:
        return _entry("fail", "jax_enable_x64 is OFF — import pycamset_tpu "
                              "before any other jax use, or solves will "
                              "run in f32 and stall")
    prec = jax.config.jax_default_matmul_precision
    if prec != "highest":
        return _entry("warn", f"jax_default_matmul_precision={prec!r} (want "
                              "'highest'; bf16 matmuls multiply LM iteration "
                              "counts ~20x on TPU)")
    return _entry("ok", "x64 on, matmul precision 'highest'")


def check_devices() -> dict:
    """Attached accelerators; CPU-only is functional but slow at scale."""
    import jax

    devs = jax.devices()
    plat = devs[0].platform
    detail = f"{len(devs)} {plat} device(s)"
    if plat == "cpu":
        return _entry("warn", detail + " — no accelerator attached; solves "
                                       "run on host CPU")
    return _entry("ok", detail)


def check_blosc() -> dict:
    """.camset codec: native libblosc preferred, pure-Python fallback works.

    Always exercises a real compress/decompress round trip so a broken
    library (not just a missing one) is caught.
    """
    from pycamset_tpu.utils import blosc_compat

    arr = np.arange(192, dtype=np.float64).reshape(8, 24)
    save_dict = blosc_compat.compress_reference_dict(arr)
    back = blosc_compat.decompress_reference_dict(save_dict)
    if not np.array_equal(back, arr):
        return _entry("fail", "blosc round trip corrupted data")
    if blosc_compat.native_blosc_available():
        return _entry("ok", "native libblosc, round trip ok")
    return _entry("warn", "libblosc absent — pure-Python codec (reads all "
                          "reference files; writes are slower), round trip ok")


def check_pyvista() -> dict:
    """Optional 3D viewer; absent/counterfeit falls back to SimpleMesh."""
    from pycamset_tpu.utils.optional import import_pyvista

    try:
        pv = import_pyvista()
    except ImportError:
        return _entry("warn", "pyvista absent or invalid — interactive 3D "
                              "scenes fall back to matplotlib/SimpleMesh")
    return _entry("ok", f"pyvista {pv.__version__}")


def check_aruco() -> dict:
    """Render a small ChArUco board and detect it with the product path.

    Exercises the exact cv2 aruco API surface the calibrator depends on
    (CharucoDetector, squeezed-array returns, pattern layouts).
    """
    from pycamset_tpu.models.charuco import ChArUco

    target = ChArUco(5, 5, 10.0)
    img = target.board.generateImage((400, 400))
    det = target.find_in_image(img)
    if not det.has_data or det.data_len < 4:
        found = det.data_len if det.has_data else 0
        return _entry("fail", f"only {found} corners detected on a clean "
                              "synthetic 5x5 board — cv2 aruco API mismatch?")
    return _entry("ok", f"{det.data_len} corners on a synthetic 5x5 board")


def check_device_smoke(n_points: int = 512, warm_calls: int = 20) -> dict:
    """Compile and run a tiny projection on the default device.

    Times the first call (compile + the first device->host fetch, which on
    a tunnelled TPU includes a one-off multi-minute bring-up) and the warm
    per-call rate. Warm timing follows the repo's tunnel-safe recipe:
    enqueue ``warm_calls`` dispatches on perturbed inputs and force ONE
    fetch of the final result (``block_until_ready`` does not block
    through the tunnel).
    """
    import jax
    import jax.numpy as jnp

    from pycamset_tpu.ops.projection import project_world_points

    @jax.jit
    def _smoke(intr9, extr6, pts):
        uv = project_world_points(intr9, extr6, pts)
        return jnp.sum(uv * uv)

    # the device dtype: f32 on TPU (f64 programs abort the remote
    # compiler — see CLAUDE.md serving notes), f64 elsewhere under x64
    plat = jax.devices()[0].platform
    dtype = np.float32 if plat == "tpu" else np.float64
    rng = np.random.default_rng(0)
    intr9 = np.array([1000.0, 320.0, 1000.0, 240.0, 0.01, -0.02, 0.0, 0.0,
                      0.001], dtype=dtype)
    extr6 = np.array([0.01, -0.02, 0.03, 0.0, 0.0, 1.2], dtype=dtype)
    pts = rng.normal(scale=0.1, size=(n_points, 3)).astype(dtype)

    t0 = time.perf_counter()
    first = float(_smoke(intr9, extr6, pts))
    first_s = time.perf_counter() - t0
    if not np.isfinite(first):
        return _entry("fail", "device smoke produced a non-finite result")

    t0 = time.perf_counter()
    out = None
    for i in range(warm_calls):
        out = _smoke(intr9, extr6, pts + dtype(1e-6 * i))
    final = float(out)  # ONE forced fetch closes the timing window
    warm_ms = (time.perf_counter() - t0) / warm_calls * 1e3
    if not np.isfinite(final):
        return _entry("fail", "device smoke produced a non-finite result")

    detail = (f"first call {first_s:.2f}s (compile + first fetch), warm "
              f"{warm_ms:.3f}ms/call on {plat}")
    if first_s > 120.0:
        return _entry("warn", detail + " — slow first fetch is the remote "
                                       "tunnel's one-off d2h bring-up, not "
                                       "a per-solve cost")
    return _entry("ok", detail)


# ------------------------------------------------------------------ driver

CHECKS = {
    "versions": check_versions,
    "config": check_config,
    "devices": check_devices,
    "blosc": check_blosc,
    "pyvista": check_pyvista,
    "aruco": check_aruco,
    "device": check_device_smoke,
}


def run_doctor(device: bool = True) -> dict:
    """Run every check; return ``{"ok": bool, "checks": {name: entry}}``.

    A check that raises is recorded as ``fail`` with the exception text —
    the doctor itself never crashes on a broken environment.
    """
    checks: dict[str, dict] = {}
    for name, fn in CHECKS.items():
        if name == "device" and not device:
            checks[name] = _entry("skip", "device smoke disabled "
                                          "(--no-device)")
            continue
        try:
            checks[name] = fn()
        except Exception as err:  # noqa: BLE001 — report, don't crash
            checks[name] = _entry("fail", f"{type(err).__name__}: {err}")
    ok = all(e["status"] != "fail" for e in checks.values())
    return {"ok": ok, "checks": checks}


_GLYPH = {"ok": "  ok ", "warn": " warn", "fail": " FAIL", "skip": " skip"}


def format_report(report: dict) -> str:
    """Human-readable multi-line rendering of a :func:`run_doctor` report."""
    lines = [f"[{_GLYPH[e['status']]}] {name}: {e['detail']}"
             for name, e in report["checks"].items()]
    lines.append("doctor: " + ("all checks passed" if report["ok"]
                               else "FAILURES detected"))
    return "\n".join(lines)


def main(device: bool = True, json_path: str | None = None) -> int:
    """CLI entry: print the report, optionally dump JSON, return 0/1."""
    report = run_doctor(device=device)
    print(format_report(report))
    if json_path is not None:
        import json

        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"wrote {json_path}")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
