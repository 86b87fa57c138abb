"""Stream target poses against a calibrated rig (the serving path).

Calibrate once (examples/calibrate_cameras.py or the CLI), then track:
the 6-dof solve is compiled once and each frame is a single device
dispatch; `track_batch` solves every frame in one dispatch.

CLI equivalent:
    python -m pycamset_tpu track DATA --camset optimised_cameras.camset \
        --target charuco --nx 20 --ny 20 --square 4 --out poses.json
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use
from pycamset_tpu import ChArUco, TargetTracker, load_CameraSet
from pycamset_tpu.calibration.camera_calibrator import (
    detect_datapoints_in_imfile)

data = Path("my/calibration/path")
cams = load_CameraSet(data / "optimised_cameras.camset")
target = ChArUco(num_squares_x=20, num_squares_y=20, square_size=4)

detections, _ = detect_datapoints_in_imfile(
    f_loc=data, calibration_target=target)

tracker = TargetTracker(cams, target, loss="huber")   # robust to outliers
poses, info = tracker.track_batch(detections)         # all frames, 1 dispatch
for i, (pose, rms) in enumerate(zip(poses, info["rms"])):
    print(f"frame {i}: t = {pose[:3, 3].round(4)}  rms = {rms:.2f} px")

# --- production serving: freeze the compiled programs into an artifact ---
# a serving process loads this file and answers poses with no calibration
# stack and no retracing (jax.export StableHLO, symbolic frame axis)
from pycamset_tpu import export_tracker, load_tracker_artifact  # noqa: E402

export_tracker(tracker, data / "rig.trkz")

server = load_tracker_artifact(data / "rig.trkz")     # elsewhere, same platform
poses, info = server.track_batch(detections)          # bit-identical results
poses, info = server.track_stream(detections)         # ordered video, warm-start
