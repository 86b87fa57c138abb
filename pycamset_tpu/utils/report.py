"""Standalone HTML calibration reports.

One self-contained file (figures embedded as base64 PNG — no asset
directory, mailable, archivable) summarizing a calibration: rig tables,
residual statistics, the four diagnostic panels of
``utils/visualisation.py`` (cluster density, per-camera coverage,
reconstructed features, accuracy-vs-precision), per-camera distortion
quivers, and the first-order parameter uncertainties when the
calibration history is attached.

Beyond-reference capability: the reference renders diagnostics to
interactive windows only (pyCamSet/utils/visualisation.py); it has no
report artifact.
"""
from __future__ import annotations

import base64
import html
import io
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_STYLE = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 2em auto; max-width: 1100px; color: #1a1a1a; }
h1 { border-bottom: 2px solid #2b6cb0; padding-bottom: 0.2em; }
h2 { color: #2b6cb0; margin-top: 1.6em; }
table { border-collapse: collapse; margin: 0.8em 0; font-size: 0.92em; }
th, td { border: 1px solid #cbd5e0; padding: 0.35em 0.7em; text-align: right; }
th { background: #edf2f7; }
td:first-child, th:first-child { text-align: left; }
img { max-width: 100%; margin: 0.6em 0; border: 1px solid #e2e8f0; }
.warn { color: #c53030; font-weight: 600; }
.ok { color: #276749; font-weight: 600; }
.meta { color: #718096; font-size: 0.85em; }
"""


def _fig_to_b64(fig, dpi: int = 110) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=dpi, bbox_inches="tight")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _img(fig, alt: str) -> str:
    return (f'<img alt="{html.escape(alt)}" '
            f'src="data:image/png;base64,{_fig_to_b64(fig)}"/>')


def _table(headers, rows) -> str:
    head = "".join(f"<th>{html.escape(str(h))}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(str(c))}</td>" for c in row)
        + "</tr>" for row in rows)
    return f"<table><tr>{head}</tr>{body}</table>"


def _rig_table(cams) -> str:
    rows = []
    for name in cams.get_names():
        cam = cams[name]
        k = cam.intrinsic
        d = np.reshape(cam.distortion_coefs, -1)
        rows.append([
            name, f"{int(cam.res[0])}x{int(cam.res[1])}",
            f"{k[0, 0]:.1f}", f"{k[1, 1]:.1f}",
            f"({k[0, 2]:.1f}, {k[1, 2]:.1f})",
            ", ".join(f"{v:.4g}" for v in d),
            np.round(cam.position, 4).tolist(),
        ])
    return _table(["camera", "res", "fx (px)", "fy (px)", "principal",
                   "distortion", "position (m)"], rows)


def _per_camera_stats(cams, handler, err2d: np.ndarray):
    """Per-camera residual rows (the residual table is camera-major)."""
    eucl = np.linalg.norm(err2d, axis=1)
    rows, cursor = [], 0
    for cam_detection in handler.get_detection().get_cam_list():
        datum = cam_detection.get_data()
        if datum is None:
            continue
        cam_n = int(datum[0, 0])
        e = eucl[cursor:cursor + len(datum)]
        cursor += len(datum)
        rows.append([cams.get_names()[cam_n], len(datum),
                     f"{np.mean(e):.3f}", f"{np.sqrt(np.mean(e**2)):.3f}",
                     f"{np.percentile(e, 95):.3f}", f"{np.max(e):.3f}"])
    return _table(["camera", "detections", "mean (px)", "rms (px)",
                   "p95 (px)", "max (px)"], rows)


def _distortion_figs(cams):
    import matplotlib.pyplot as plt

    from pycamset_tpu.utils.general_utils import get_close_square_tuple
    n = cams.get_n_cams()
    wins = get_close_square_tuple(n)
    fig, axes = plt.subplots(*wins[::-1],
                             figsize=(4 * wins[0], 3.2 * wins[1]))
    ax = np.atleast_1d(axes).ravel()
    for i, name in enumerate(cams.get_names()):
        try:
            cams[name].view_sensor_distortion(ax=ax[i])
            ax[i].set_title(name, fontsize=9)
        except Exception as exc:  # pragma: no cover - model-dependent
            ax[i].set_title(f"{name}: {exc}", fontsize=7)
    for i in range(n, wins[0] * wins[1]):
        fig.delaxes(ax[i])
    fig.suptitle("Sensor distortion")
    return fig


def _uncertainty_section(cams) -> str:
    unc = cams.calibration_uncertainty()
    parts = [f"<p>Residual sigma {np.sqrt(unc['sigma2']):.4f} px "
             f"({unc['dof']} degrees of freedom).</p>"]
    rows = []
    for name in cams.get_names():
        si = unc["cameras"][name]["int_sigma"]
        se = unc["cameras"][name]["ext_sigma"]
        rows.append([name, f"{si[0]:.3f}", f"{si[2]:.3f}",
                     f"({si[1]:.3f}, {si[3]:.3f})",
                     f"{np.max(se[:3]) * 1e3:.3f}",
                     f"{np.max(se[3:]) * 1e3:.3f}"])
    parts.append(_table(
        ["camera", "sigma fx (px)", "sigma fy (px)", "sigma principal (px)",
         "rot (mrad, max)", "t (mm, max)"], rows))
    if "point_sigma" in unc:
        ps = np.linalg.norm(unc["point_sigma"], axis=1)
        free = ps[ps > 0]
        if free.size:
            parts.append(
                f"<p>Free target geometry: point sigma median "
                f"{np.median(free) * 1e3:.4f} mm, p90 "
                f"{np.percentile(free, 90) * 1e3:.4f} mm, max "
                f"{free.max() * 1e3:.4f} mm ({free.size} free points).</p>")
    return "\n".join(parts)


def write_calibration_report(cams, f_loc, title: str | None = None,
                             uncertainty: bool = True) -> Path:
    """Write a standalone HTML calibration report.

    :param cams: a CameraSet; with calibration history attached (a solve
        in this process or a .camset load) the report carries the full
        diagnostics, otherwise it degrades to the rig summary.
    :param uncertainty: include first-order parameter sigmas (skipped
        automatically when no history is attached).
    :return: the written path.
    """
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    f_loc = Path(f_loc)
    title = title or "Calibration report"
    parts = [f"<html><head><meta charset='utf-8'>"
             f"<title>{html.escape(title)}</title>"
             f"<style>{_STYLE}</style></head><body>"
             f"<h1>{html.escape(title)}</h1>"]

    parts.append(f"<h2>Rig ({cams.get_n_cams()} cameras)</h2>")
    parts.append(_rig_table(cams))

    handler = getattr(cams, "calibration_handler", None)
    result = getattr(cams, "calibration_result", None)
    if result is not None:
        err2d = np.reshape(np.asarray(result), (-1, 2))
        eucl = np.linalg.norm(err2d, axis=1)
        rms = float(np.sqrt(np.mean(eucl ** 2)))
        parts.append("<h2>Calibration quality</h2>")
        parts.append(
            f"<p>Mean euclidean reprojection error "
            f"<b>{np.mean(eucl):.3f} px</b>; rms {rms:.3f} px; p95 "
            f"{np.percentile(eucl, 95):.3f} px over {len(eucl)} "
            f"detections.</p>")
        if handler is not None:
            parts.append(_per_camera_stats(cams, handler, err2d))
    else:
        parts.append("<p class='meta'>No calibration history attached: "
                     "rig summary only.</p>")

    if handler is not None and result is not None \
            and getattr(cams, "calibration_params", None) is not None:
        from pycamset_tpu.utils.visualisation import visualise_calibration
        plt.close("all")
        try:
            visualise_calibration(
                {"err": np.asarray(result),
                 "x": np.asarray(cams.calibration_params)},
                handler, show=False)
            figs = [plt.figure(num) for num in plt.get_fignums()]
            captions = ["Residual distribution", "Per-camera coverage",
                        "Reconstructed calibration features",
                        "Accuracy vs precision"]
            parts.append("<h2>Diagnostics</h2>")
            for i, fig in enumerate(figs):
                cap = captions[i] if i < len(captions) else \
                    f"Handler diagnostic {i - len(captions) + 1}"
                parts.append(f"<h3>{html.escape(cap)}</h3>")
                parts.append(_img(fig, cap))
        except Exception as exc:
            logger.warning("diagnostic panels failed: %s", exc)
            parts.append(f"<p class='warn'>Diagnostic panels unavailable: "
                         f"{html.escape(str(exc))}</p>")
        finally:
            plt.close("all")

    try:
        parts.append("<h2>Distortion</h2>")
        fig = _distortion_figs(cams)
        parts.append(_img(fig, "sensor distortion"))
        plt.close("all")
    except Exception as exc:  # pragma: no cover - display-dependent
        logger.warning("distortion quivers failed: %s", exc)

    if uncertainty and handler is not None:
        try:
            parts.append("<h2>Parameter uncertainty</h2>")
            parts.append(_uncertainty_section(cams))
        except Exception as exc:
            logger.warning("uncertainty section failed: %s", exc)
            parts.append(f"<p class='meta'>Uncertainty unavailable: "
                         f"{html.escape(str(exc))}</p>")

    parts.append("</body></html>")
    f_loc.write_text("\n".join(parts))
    logger.info("calibration report -> %s", f_loc)
    return f_loc
