"""Serving artifacts: AOT-exported tracker solvers (`jax.export`).

Production pose-serving should not need the calibration stack: a process
that answers "where is the target in this frame" needs the compiled
solver and the rig header, not Python retracing of the model chain. This
module freezes a :class:`~pycamset_tpu.tracking.TargetTracker`'s device
programs into one portable artifact file:

- the batched seeded solve (device triangulation + rigid-fit seeding +
  vmapped 6-dof LM) and the sequential warm-start stream solve are
  exported as StableHLO via ``jax.export`` with a SYMBOLIC frame axis —
  one artifact serves any number of frames;
- the host-side rig header (camera names, detection capacity, template
  shape, dtype, platform) rides alongside as JSON;
- :func:`load_tracker_artifact` restores a :class:`ServingTracker` that
  answers ``track_batch`` / ``track_stream`` on detection tables with NO
  Python tracing and no CameraSet — the solver programs already carry
  the calibrated rig constants.

The exported programs are platform-checked by jax.export itself (an
artifact exported on TPU refuses to run on CPU and vice versa); export
on the serving platform. Host PnP rescue needs the full rig and is not
part of an artifact — the batch path uses the device triangulation
seeding (``seed_mode='device'`` semantics), the stream path warm-starts
from an explicit ``init`` or the device seed of its first seedable
frame.

Beyond-reference capability (the reference has no serving path at all;
its closest feature is the bit-rotted find_target module —
pyCamSet/optimisation/find_target.py:6-7).
"""
from __future__ import annotations

import io
import json
import types
import zipfile
from pathlib import Path

import numpy as np

_FORMAT = "pycamset_tpu.tracker_artifact.v1"


def export_tracker(tracker, path: Path | str) -> Path:
    """Freeze ``tracker``'s device programs into an artifact file.

    :param tracker: a constructed TargetTracker (rig constants baked in).
    :param path: destination file (conventionally ``.trkz``).
    """
    import jax
    from jax import export as jexport

    # the tracker's packed (I, 45) result rows [x|cost|nit|status|cov]
    # keep the artifact pytree trivial (no namedtuple registrations) AND
    # keep serving to ONE fetched leaf per call (the tunnel charges a
    # fixed cost per fetched array)
    def batch_fn(uv_grid, mask_grid, cam_i, key_i, uv, mask):
        return tracker._solve_batch_seeded(
            uv_grid, mask_grid, cam_i, key_i, uv, mask)  # (out, seeds)

    def stream_fn(pose0, cam_i, key_i, uv, mask):
        return tracker._solve_stream(pose0, cam_i, key_i, uv, mask)

    dtype = np.dtype(tracker._dtype).name
    n = tracker.max_detections
    n_keys, n_cams = tracker.n_keys, tracker.n_cams
    (b,) = jexport.symbolic_shape("b")
    f = jax.ShapeDtypeStruct
    i64 = np.int64

    batch_specs = (f((b, n_keys, n_cams, 2), dtype),   # uv_grid
                   f((b, n_keys, n_cams), dtype),      # mask_grid
                   f((b, n), i64), f((b, n), i64),     # cam_i, key_i
                   f((b, n, 2), dtype), f((b, n), dtype))
    stream_specs = (f((tracker._n_state,), dtype),
                    f((b, n), i64), f((b, n), i64),
                    f((b, n, 2), dtype), f((b, n), dtype))

    exp_batch = jexport.export(jax.jit(batch_fn))(*batch_specs)
    exp_stream = jexport.export(jax.jit(stream_fn))(*stream_specs)

    meta = {
        "format": _FORMAT,
        "platform": jax.default_backend(),
        "dtype": dtype,
        "max_detections": n,
        "n_keys": n_keys,
        "n_cams": n_cams,
        "cam_names": list(tracker.camset.get_names()),
        "keydims": [int(d) for d in tracker.target.point_data.shape[:-1]],
        "n_state": int(tracker._n_state),
    }
    out = Path(path)
    with zipfile.ZipFile(out, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("solve_batch.bin", exp_batch.serialize())
        z.writestr("solve_stream.bin", exp_stream.serialize())
        buf = io.BytesIO()
        np.save(buf, np.asarray(tracker._tpl))
        z.writestr("template.npy", buf.getvalue())
    return out


class ServingTracker:
    """Pose serving from an artifact: packing + exported solvers only.

    API mirrors the tracker's batch/stream calls; construction does no
    tracing and needs no CameraSet. The host-side packing/finalize
    methods are the live tracker's own (they only read attributes this
    class carries), so batch results are bit-identical to
    ``TargetTracker.track_batch(..., seed_mode='device')``.
    """

    def __init__(self, meta: dict, exp_batch, exp_stream,
                 template: np.ndarray):
        self.meta = meta
        self._exp_batch, self._exp_stream = exp_batch, exp_stream
        self._dtype = np.dtype(meta["dtype"])
        self.max_detections = int(meta["max_detections"])
        self.n_keys = int(meta["n_keys"])
        self.n_cams = int(meta["n_cams"])
        self._tpl = template
        self._n_state = int(meta.get("n_state", 6))
        # _pack_table reads target.point_data.shape[:-1] (the key dims)
        self.target = types.SimpleNamespace(
            point_data=np.zeros(tuple(meta["keydims"]) + (3,)))
        self._last_pose = None

    def _pack_table(self, detection):
        from pycamset_tpu.tracking import TargetTracker
        return TargetTracker._pack_table(self, detection)

    def _finalize(self, out, mask):
        from pycamset_tpu.tracking import TargetTracker
        return TargetTracker._finalize_batch(self, np.asarray(out), mask)

    def track_batch(self, detection):
        """Poses for every image in the table (device seeding; the host
        PnP rescue needs the full rig and is not part of an artifact)."""
        import jax

        dd_all, bounds, n_frames, mask, dev_args = self._pack_table(detection)
        uv_grid, mask_grid = self._grids(dd_all, n_frames)
        out, _seeds = self._exp_batch.call(uv_grid, mask_grid, *dev_args)
        return self._finalize(jax.device_get(out), mask)

    def track_stream(self, detection, init=None):
        """Sequential warm-start tracking; ``init`` seeds frame 0 (6-vec
        or 4x4). Default: the device triangulation seed of the first
        frame two cameras see (via the batch program's seed output)."""
        import jax

        from pycamset_tpu.utils.general_utils import ext_4x4_to_rod

        dd_all, bounds, n_frames, mask, dev_args = self._pack_table(detection)
        if init is None:
            init = self._device_seed(dd_all, n_frames, dev_args)
        if init is None:
            raise ValueError("no stereo-seedable frame found and no init "
                             "given for track_stream")
        init = np.asarray(init, dtype=float)
        if init.shape == (4, 4):
            init = np.concatenate(ext_4x4_to_rod(init))
        init = np.ravel(init)
        if init.size == 6 and self._n_state == 12:
            init = np.concatenate([init, np.zeros(6)])
        out = self._exp_stream.call(np.asarray(init, dtype=self._dtype),
                                    *dev_args)
        return self._finalize(jax.device_get(out), mask)

    def _grids(self, dd_all, n_frames):
        from pycamset_tpu.tracking import TargetTracker
        return TargetTracker._obs_grids(self, dd_all, n_frames)

    def _device_seed(self, dd_all, n_frames, dev_args):
        """Triangulation seed of the first genuinely seedable frame:
        >= 3 keys each observed by >= 2 cameras (the seeder's own
        frame_ok rule — a weaker test would hand back its zeros
        fallback pose and silently warm-start the stream from
        identity)."""
        import jax

        im_c = dd_all[:, 1].astype(int)
        for i in range(n_frames):
            rows = dd_all[im_c == i]
            if not len(rows):
                continue
            pairs = np.unique(rows[:, [0, -3]].astype(int), axis=0)
            _keys, ncams = np.unique(pairs[:, 1], return_counts=True)
            if int((ncams >= 2).sum()) < 3:
                continue
            r = rows.copy()
            r[:, 1] = 0  # renumber the single frame for a 1-grid
            uv_g, m_g = self._grids(r, 1)
            _out, seeds = self._exp_batch.call(
                uv_g, m_g, *(np.asarray(a[i:i + 1]) for a in dev_args))
            return np.asarray(jax.device_get(seeds))[0]
        return None


def load_tracker_artifact(path: Path | str) -> ServingTracker:
    """Restore a ServingTracker from :func:`export_tracker`'s file."""
    from jax import export as jexport

    with zipfile.ZipFile(Path(path), "r") as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("format") != _FORMAT:
            raise ValueError(f"not a tracker artifact: {path}")
        exp_batch = jexport.deserialize(z.read("solve_batch.bin"))
        exp_stream = jexport.deserialize(z.read("solve_stream.bin"))
        template = np.load(io.BytesIO(z.read("template.npy")))
    return ServingTracker(meta, exp_batch, exp_stream, template)
