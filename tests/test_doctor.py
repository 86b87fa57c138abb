"""Environment self-test (`pycamset_tpu doctor`, utils/doctor.py).

Runs under the CPU conftest (8 virtual devices); the device smoke test
compiles a tiny projection there in well under a second.
"""
import json
import types

from pycamset_tpu.utils import doctor


def test_run_doctor_full_pass():
    report = doctor.run_doctor(device=True)
    assert set(report["checks"]) == set(doctor.CHECKS)
    assert report["ok"]
    # hard requirements of this environment: config, codec, detection and
    # the device smoke must all be fully ok, not merely non-failing
    for name in ("versions", "config", "blosc", "aruco", "device"):
        assert report["checks"][name]["status"] == "ok", report["checks"][name]
    # CPU-only test process: devices is a warn, never a fail
    assert report["checks"]["devices"]["status"] in ("ok", "warn")
    text = doctor.format_report(report)
    assert "all checks passed" in text
    assert "aruco" in text


def test_no_device_skips_smoke():
    report = doctor.run_doctor(device=False)
    assert report["checks"]["device"]["status"] == "skip"
    assert report["ok"]


def test_counterfeit_pyvista_is_warn_not_crash(monkeypatch):
    fake = types.ModuleType("pyvista")
    fake.PolyData = object()  # not a type — must fail validation
    monkeypatch.setitem(__import__("sys").modules, "pyvista", fake)
    entry = doctor.check_pyvista()
    assert entry["status"] == "warn"
    assert "fall back" in entry["detail"]


def test_crashing_check_is_reported_not_raised(monkeypatch):
    def _boom():
        raise RuntimeError("detector exploded")
    monkeypatch.setitem(doctor.CHECKS, "aruco", _boom)
    report = doctor.run_doctor(device=False)
    assert report["checks"]["aruco"]["status"] == "fail"
    assert "detector exploded" in report["checks"]["aruco"]["detail"]
    assert not report["ok"]
    assert "FAILURES" in doctor.format_report(report)


def test_cli_doctor_json(tmp_path, capsys):
    from pycamset_tpu.__main__ import main

    out = tmp_path / "doctor.json"
    rc = main(["doctor", "--no-device", "--json", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["ok"]
    assert report["checks"]["device"]["status"] == "skip"
    assert "all checks passed" in capsys.readouterr().out
