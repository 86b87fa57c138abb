"""CLI tests (python -m pycamset_tpu)."""
import shutil
from pathlib import Path

import pytest

REF_DATA = Path("/root/reference/tests/test_data/calibration_charuco")

pytestmark = pytest.mark.skipif(
    not REF_DATA.exists(), reason="reference test data unavailable")


@pytest.fixture(scope="module")
def cli_data(tmp_path_factory):
    dst = tmp_path_factory.mktemp("cli_data")
    from pycamset_tpu.utils.general_utils import natsorted
    for sub in ["1", "2", "3"]:
        (dst / sub).mkdir()
        for f in natsorted((REF_DATA / sub).glob("*.jpg"))[:5]:
            shutil.copy(f, dst / sub / f.name)
    return dst


def test_cli_calibrate_and_info(cli_data, capsys):
    from pycamset_tpu.__main__ import main
    rc = main(["calibrate", str(cli_data), "--target", "charuco",
               "--nx", "20", "--ny", "20", "--square", "4", "--legacy",
               "--outliers", "n", "--max-nfev", "25"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "calibrated 3 cameras" in out

    rc = main(["info", str(cli_data / "optimised_cameras.camset")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "3 cameras" in out and "mean reprojection error" in out


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_cli_info_uncertainty(cli_data):
    from pycamset_tpu.__main__ import main
    rc = main(["info", str(cli_data / "optimised_cameras.camset"),
               "--uncertainty"])
    assert rc == 0
