"""The one-call calibration entry point (ref: examples/calibrate_cameras.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # checkout use

from pycamset_tpu import ChArUco, calibrate_cameras

calibration_data = "my/calibration/path"
calibration_target = ChArUco(num_squares_x=10, num_squares_y=10, square_size=4)

cams = calibrate_cameras(f_loc=calibration_data,
                         calibration_target=calibration_target, draw=True)
