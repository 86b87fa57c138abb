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

from copy import copy

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
    cov = np.cov(x, y)
    eigenvalues, eigenvectors = np.linalg.eigh(cov)
    angle = np.degrees(np.arctan2(*eigenvectors[:, 0][::-1]))
    width, height = 2 * np.sqrt(np.clip(eigenvalues, 0, None))
    for k in (1, 2, 3):
        ax.add_patch(Ellipse((0, 0), k * width, k * height, angle=angle,
                             edgecolor="firebrick", facecolor="none", lw=1))
    phi = np.radians(angle)
    x_text = width / 2 * np.cos(phi)
    y_text = width / 2 * np.sin(phi)
    for k, lab in zip((1.3, 2.3, 3.3), (r"$\sigma$", r"$2\sigma$", r"$3\sigma$")):
        ax.text(k * x_text, k * y_text, lab, fontsize=12, color="firebrick",
                ha="center", va="center")
    return max(height, width) / 2


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
    err_buff = copy(euclidean_err)
    full_err = copy(np.reshape(o_results["err"], (-1, 2)))
    im = None

    for cam_detection in detection.get_cam_list():
        datum = cam_detection.get_data()
        if datum is None:
            continue
        cam_n = int(datum[0, 0])
        p_x = cams[cam_n].intrinsic[0, 2]
        p_y = cams[cam_n].intrinsic[1, 2]
        loc_x, loc_y = datum[:, -2], datum[:, -1]
        error, err_buff = err_buff[: len(datum)], err_buff[len(datum):]
        err, full_err = full_err[: len(datum)], full_err[len(datum):]
        away_vec = np.copysign(
            np.ones(datum.shape[0]),
            (loc_x - p_x) * err[:, 0] + (loc_y - p_y) * err[:, 1])
        im = ax[cam_n].scatter(loc_x, loc_y, c=error * away_vec, vmin=-e_lim,
                               vmax=e_lim, s=2, alpha=0.4, cmap="coolwarm")
        ax[cam_n].set_title(
            f"{detection.cam_names[cam_n]} mean error {np.mean(error):.2f}",
            fontsize=8)
        ax[cam_n].set_xlim([0, cams[cam_n].res[0]])
        ax[cam_n].set_ylim([0, cams[cam_n].res[1]])
        ax[cam_n].set_aspect("equal")

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

    mask = []
    point_locs: dict = {}
    col_locs: dict = {}
    raw_obj_points = []
    errors = []
    bad_points = 0
    for point, im_n, key, c in zip(reconstructed, im_nums, keys, error_subset):
        pose = poses[int(im_n)].reshape(3, 4)
        obj_point = pose[:, :3].T @ (point - pose[:, 3])
        ok = np.linalg.norm(obj_point) < 3 * mean_dist
        mask.append(ok)
        if not ok:
            bad_points += 1
        else:
            raw_obj_points.append(obj_point)
            point_locs.setdefault(tuple(key.astype(int)), []).append(obj_point)
            col_locs.setdefault(tuple(key.astype(int)), []).append(c)
            errors.append(c)

    m = np.array(mask)
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

    raw_data = []
    err_buff2 = []
    for (key, point_loc), err in zip(point_locs.items(), col_locs.values()):
        if len(point_loc) > 2:
            if len(key) == 1:
                key = (0, key[0])
            obj_point = param_handler.target.original_points[key]
            data_array = np.array(point_loc)
            dif = data_array - obj_point
            mean_err = np.mean(np.linalg.norm(dif, axis=1))
            obj_scatter = np.mean(reject_outliers(
                np.linalg.norm(dif - np.mean(dif, axis=0), axis=1)))
            raw_data.append([mean_err, obj_scatter])
            err_buff2.append(np.mean(err))

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
