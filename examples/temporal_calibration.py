"""Temporal calibration of an unsynchronized rolling-shutter rig — runnable.

Most multi-camera rigs are NOT hardware-genlocked, and most CMOS sensors
are rolling shutter. Both corrupt moving-target work: a clock offset or
an in-frame readout skew shows up as reprojection error proportional to
the target's image-plane velocity. This demo builds a synthetic
unsynchronized rolling-shutter capture against a known rig and walks the
full production workflow:

1. `calibrate_time_offsets` recovers per-camera clock offsets, rate skew
   and rolling-shutter readout from ONE moving-target recording;
2. `TargetTracker(rolling_shutter=..., time_offsets=...)` consumes them:
   the 12-dof [pose | velocity] per-frame solve removes the skew and
   reports velocities.

CLI equivalent on real image/video folders:
    python -m pycamset_tpu sync DATA --camset rig.camset --target charuco \
        --nx 20 --ny 20 --square 4 --fps 30 --skew --rolling-shutter
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from pycamset_tpu import TargetTracker, calibrate_time_offsets  # noqa: E402
from pycamset_tpu.calibration.sync import format_sync_report  # noqa: E402

# synthetic unsynchronized rolling-shutter capture (the sync test
# generator: a ring rig watching a target wave through the volume)
from test_sync import _grid_target, _moving_capture, _ring_rig  # noqa: E402

cams = _ring_rig(n=3)
tpl, target = _grid_target()
TRUE_OFFSETS = np.array([0.0, 0.23, -0.31])      # frames (cam0 = time base)
TRUE_READOUT = np.array([0.65, 0.70, 0.60])      # frames per frame scan
detections, _ = _moving_capture(cams, tpl, 48, TRUE_OFFSETS,
                                readouts=TRUE_READOUT, noise=0.2, seed=3)

# ---- 1. estimate the clock model from the moving capture ----
res = calibrate_time_offsets(cams, detections, target, fps=30.0,
                             estimate_rolling_shutter=True)
print(format_sync_report(res, fps=30.0))
print(f"true offsets: {TRUE_OFFSETS}, true readout: {TRUE_READOUT}")

# ---- 2. feed the clock model to the serving tracker ----
tracker = TargetTracker(cams, target, rolling_shutter=res.readout,
                        time_offsets=res.offsets)
poses, info = tracker.track_batch(detections)
naive = TargetTracker(cams, target)
_, info_naive = naive.track_batch(detections)
print(f"tracking rms: {info['rms'].mean():.3f} px with the clock model, "
      f"{info_naive['rms'].mean():.3f} px ignoring it")
print("per-frame velocity of frame 10 [rvec_dot | t_dot]:",
      info["velocity"][10].round(4))
