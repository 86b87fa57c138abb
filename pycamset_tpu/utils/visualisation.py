"""Calibration diagnostics plots.

Capability parity target (reference, behaviour only):
pyCamSet/utils/visualisation.py — cluster_plot with 1/2/3-sigma ellipses,
confidence contours, visualise_calibration (residual cluster plot, per-camera
coverage scatter coloured by signed radial error, reconstructed points in
world + target space, accuracy-vs-precision chart).

Rendering is matplotlib-first (pyvista is optional in this environment); the
3D scatter panels use matplotlib's 3D axes when pyvista is absent.
"""
from __future__ import annotations

import numpy as np

from pycamset_tpu.utils.general_utils import get_close_square_tuple


def _plt():
    import matplotlib.pyplot as plt
    return plt


def fancy_confidence_contours(x, y, ax, ranges=None):
    """Draw the 1/2/3-sigma covariance ellipses of 2D residuals.

    :return: the largest semi-axis of the 1-sigma ellipse.
    """
    from matplotlib.patches import Ellipse
    evals, evecs = np.linalg.eigh(np.cov(x, y))
    tilt_deg = np.degrees(np.arctan2(evecs[1, 0], evecs[0, 0]))
    ax_w, ax_h = 2 * np.sqrt(np.clip(evals, 0, None))
    for k in (1, 2, 3):
        ax.add_patch(Ellipse((0, 0), k * ax_w, k * ax_h, angle=tilt_deg,
                             edgecolor="firebrick", facecolor="none", lw=1))
    # sigma labels sit just outside each ring, along the tilted major axis
    tilt = np.radians(tilt_deg)
    along = 0.5 * ax_w * np.array([np.cos(tilt), np.sin(tilt)])
    for k, lab in zip((1.3, 2.3, 3.3),
                      (r"$\sigma$", r"$2\sigma$", r"$3\sigma$")):
        ax.text(*(k * along), lab, fontsize=12, color="firebrick",
                ha="center", va="center")
    return max(ax_h, ax_w) / 2


def cluster_plot(data_list, ranges=None, titles=None, alphas=None,
                 s_per=None, save=None):
    """Density plot of 2D residual clusters with sigma contours.

    :param data_list: list of flattened [x0,y0,x1,y1,...] residual arrays.
    """
    plt = _plt()
    from matplotlib.colors import LinearSegmentedColormap, LogNorm
    blues_with_white = LinearSegmentedColormap.from_list(
        "Blues_with_white",
        [(1, 1, 1), *plt.cm.Blues(np.linspace(0, 1, 1024)[:900])])

    n = len(data_list)
    ranges = ranges or [None] * n
    titles = titles or [None] * n
    fig, axs = plt.subplots(1, n)
    r_ax = np.atleast_1d(axs).ravel()

    for datum, ax, rang, title in zip(data_list, r_ax, ranges, titles):
        x, y = datum[::2], datum[1::2]
        m_1 = np.mean(np.sqrt(x ** 2 + y ** 2))
        cov = np.cov(x, y)
        sd = np.sqrt(np.max(np.linalg.eigvalsh(cov)))
        ax.hist2d(x=x, y=y, bins=np.linspace(-3 * sd, 3 * sd, 100),
                  norm=LogNorm(vmin=1e-4, vmax=1), cmap=blues_with_white,
                  density=True, rasterized=True)
        sd = fancy_confidence_contours(
            x, y, ax=ax, ranges=list(ax.get_ylim()) + list(ax.get_xlim()))
        ax.set_aspect("equal")
        lim = rang if rang is not None else 3 * sd
        ax.set_xlim([-lim, lim])
        ax.set_ylim([-lim, lim])
        base = f"Mean euclidean error = {m_1:.2f} px"
        ax.set_title(base if title is None else f"{title}\n{base}")
        ax.set_ylabel(r"$\it{y}$ error (px)")
        ax.set_xlabel(r"$\it{x}$ error (px)")
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
        ax.locator_params(nbins=5)

    if save is not None:
        plt.savefig(save)
    return fig


def visualise_calibration(o_results: dict, param_handler, show: bool = True):
    """Draw the calibration diagnostics.

    Panels: residual cluster density, per-camera coverage scatter coloured by
    polarised (towards/away from the principal point) reprojection error,
    reconstructed calibration features in world and target coordinates, and
    an accuracy-vs-precision chart of the recovered feature locations.
    """
    plt = _plt()
    euclidean_err = np.linalg.norm(
        np.reshape(o_results["err"], (-1, 2)), axis=1)
    e_lim = np.median(euclidean_err) * 3

    detection = param_handler.get_detection()
    cams, poses = param_handler.get_camset(o_results["x"], return_pose=True)

    cluster_plot([np.reshape(o_results["err"], -1)])

    # per-camera coverage
    n_cams = cams.get_n_cams()
    windows = get_close_square_tuple(n_cams)
    fig, axes = plt.subplots(*windows[::-1])
    ax = np.atleast_1d(axes).ravel()
    # residual rows are stored camera-major, so each camera consumes the
    # next len(datum) entries of the residual tables
    cursor = 0
    vec_err = np.reshape(o_results["err"], (-1, 2))
    im = None
    for cam_detection in detection.get_cam_list():
        datum = cam_detection.get_data()
        if datum is None:
            continue
        cam_n = int(datum[0, 0])
        rows = slice(cursor, cursor + len(datum))
        cursor += len(datum)
        cam_err = euclidean_err[rows]

        # sign each residual by whether it points away from the principal
        # point (radial over/under-shoot reads as colour polarity)
        principal = cams[cam_n].intrinsic[:2, 2]
        outward = datum[:, -2:] - principal
        polarity = np.copysign(1.0, np.sum(outward * vec_err[rows], axis=1))

        panel = ax[cam_n]
        im = panel.scatter(datum[:, -2], datum[:, -1], c=cam_err * polarity,
                           vmin=-e_lim, vmax=e_lim, s=2, alpha=0.4,
                           cmap="coolwarm")
        panel.set_title(
            f"{detection.cam_names[cam_n]} mean error {np.mean(cam_err):.2f}",
            fontsize=8)
        panel.set_xlim([0, cams[cam_n].res[0]])
        panel.set_ylim([0, cams[cam_n].res[1]])
        panel.set_aspect("equal")

    if n_cams > 15:
        for axs_ in ax:
            axs_.set_xticks([])
            axs_.set_yticks([])
    for i in range(n_cams, windows[0] * windows[1]):
        fig.delaxes(ax[i])
    if im is not None:
        cbar = fig.colorbar(im, ax=list(np.atleast_1d(axes).ravel()))
        cbar.set_label("Polarised Reprojection Error (px)")
    fig.suptitle("Per Camera Coverage")

    # reconstructed features in world + target space
    to_reconstruct = detection.sort(["key", "im_num"]).get_data()
    reconstructed, recon_subset, where_mask, _ = cams.multi_cam_triangulate(
        to_reconstruct, return_used=True)
    error_subset = np.array([np.mean(euclidean_err[d]) for d in where_mask])

    inv = np.sort(np.unique(recon_subset[:, 1:-2], axis=0, return_index=True)[1])
    im_nums = recon_subset[inv, 1]
    keys = recon_subset[inv, 2:-2]
    mean_dist = np.mean(np.linalg.norm(param_handler.target.point_data, axis=-1))

    # pull every reconstruction into its image's target frame; points far
    # outside the model radius are triangulation failures
    in_target: list = []
    by_feature: dict = {}
    err_by_feature: dict = {}
    errors: list = []
    mask = np.zeros(len(reconstructed), dtype=bool)
    for row, (point, im_n, key, c) in enumerate(
            zip(reconstructed, im_nums, keys, error_subset)):
        rt = poses[int(im_n)].reshape(3, 4)
        local = rt[:, :3].T @ (point - rt[:, 3])
        if np.linalg.norm(local) >= 3 * mean_dist:
            continue
        mask[row] = True
        in_target.append(local)
        feature = tuple(key.astype(int))
        by_feature.setdefault(feature, []).append(local)
        err_by_feature.setdefault(feature, []).append(c)
        errors.append(c)
    bad_points = int(len(reconstructed) - mask.sum())
    raw_obj_points = in_target

    m = mask
    fig3 = plt.figure(figsize=(10, 5))
    ax_w = fig3.add_subplot(1, 2, 1, projection="3d")
    sc = ax_w.scatter(*reconstructed[m].T, c=error_subset[m], s=2,
                      vmin=0, vmax=e_lim)
    ax_w.set_title("Reconstructed Points in Scene Coordinates")
    for cam in cams:
        ax_w.scatter(*cam.position, marker="^", color="k", s=30)
    ax_t = fig3.add_subplot(1, 2, 2, projection="3d")
    if raw_obj_points:
        obj = np.array(raw_obj_points)
        ax_t.scatter(*obj.T, c=errors, s=4, vmin=0, vmax=e_lim)
    ax_t.set_title(f"Reconstructed Points in Target Coordinates\n"
                   f"{bad_points} erroneous points")
    fig3.colorbar(sc, ax=[ax_w, ax_t], label="Reprojection error (px)")

    # accuracy vs precision of the recovered feature positions
    def reject_outliers(data, m_=2.0):
        d = np.abs(data - np.median(data))
        mdev = np.median(d)
        s = d / mdev if mdev else np.zeros_like(d)
        return data[s < m_]

    acc_prec = []
    feature_errs = []
    for (feature, sightings), errs in zip(by_feature.items(),
                                          err_by_feature.values()):
        if len(sightings) <= 2:
            continue
        if len(feature) == 1:
            feature = (0, feature[0])
        expected = param_handler.target.original_points[feature]
        offsets = np.array(sightings) - expected
        accuracy = np.mean(np.linalg.norm(offsets, axis=1))
        precision = np.mean(reject_outliers(
            np.linalg.norm(offsets - offsets.mean(axis=0), axis=1)))
        acc_prec.append([accuracy, precision])
        feature_errs.append(np.mean(errs))
    raw_data, err_buff2 = acc_prec, feature_errs

    fig4, ax4 = plt.subplots()
    if raw_data:
        raw_data = np.array(raw_data)
        sc4 = ax4.scatter(raw_data[:, 0] * 1000, raw_data[:, 1] * 1000,
                          c=np.clip(err_buff2, 0, e_lim), s=8)
        line = np.linspace(0, np.amax(raw_data[:, 0]) * 1000, 100)
        ax4.plot(line, line, "r")
        fig4.colorbar(sc4, label="Reprojection error (px)")
        ax4.set_title("Accuracy vs Precision of target feature locations")
        ax4.set_xlabel("Accuracy, mean distance from expected location (mm)")
        ax4.set_ylabel("Precision, mean distance from mean feature location (mm)")
    else:
        ax4.set_title("Accuracy vs precision: n/a for single timestep images")

    if show:
        plt.show()
    param_handler.special_plots(o_results["x"])
