"""Bench capture-proofing (round-4 VERDICT item 1).

Round 4's driver record was all-null for two reasons: a hung tunnel RPC
starved every later phase, and the JSON line outgrew the driver's
2000-char stdout-tail capture window. These tests pin the fixes: a
hanging phase is killed by its own timeout and the phases that finished
still land in a parseable, compact final line; and a FULLY-populated
line (every field at representative values) stays under 1500 chars.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


class TestRenderLine:
    @staticmethod
    def _full_results():
        """Every field populated at representative (round-4-scale)
        values — the worst-case line length."""
        return {
            "tpu_mvox": 465.98, "blobs": 600, "cpu": 0.382,
            "blk_e2e": 19.73, "blk_dev": 342.55, "blk_dev_np": 338.21,
            "blk_blobs": 1500,
            "blk_split": [12.34, 10.56, 30.12, 1.23, 0.45],
            "dens": {"0.1x": [11, 402.1, 384.2],
                     "1x": [112, 342.5, 330.1],
                     "10x": [1125, 221.9, 251.3]},
            "reg_ips": 413.5, "reg_ips_sh": 389.2,
            "reg_wall": 57.41, "reg_dsc": 0.9784,
            "gauntlet": {
                "wall_s": 423.4, "pairs": {
                    "seed0": [0.9891, 0.96, 0.801, 0.051, 0.82,
                              1.62, 16.4],
                    "seed10": [0.9876, 0.955, 0.812, 0.048, 0.76,
                               1.71, 15.9],
                    "trunc0": [0.9712, 0.941, 0.803, 0.062, 0.68,
                               2.05, 14.2]},
                "passes": True},
            "groupwise": [127.3, 4, 0.818, 0.905],
            "bigvol": [2.25, 18.42, 5987, 1.08],
            "grid": [8, 3.2, 28.5, 8.9],
            "bw": 84.9, "tf": 37.8,
            "done": ["headline", "block", "reg_ips", "reg_ips_sh",
                     "reg_full", "gauntlet", "groupwise", "bigvol",
                     "grid", "probe"]}

    def test_full_line_under_capture_window(self):
        """< 1500 chars fully populated: fits the driver's 2000-char
        stdout tail with margin even after a partial earlier line."""
        line = bench.render_line(self._full_results())
        assert len(line) < 1500, len(line)
        parsed = json.loads(line)
        assert parsed["value"] == 465.98
        assert parsed["vs_baseline"] == pytest.approx(1219.84, abs=0.1)
        assert parsed["extra"]["gauntlet"]["passes"] is True

    def test_empty_line_parses(self):
        line = bench.render_line({"done": []})
        parsed = json.loads(line)
        assert parsed["value"] is None
        assert parsed["vs_baseline"] is None
        assert parsed["extra"]["done"] == []

    def test_partial_line_parses(self):
        line = bench.render_line(
            {"tpu_mvox": 400.0, "cpu": 0.4, "done": ["headline"]})
        parsed = json.loads(line)
        assert parsed["value"] == 400.0
        assert parsed["vs_baseline"] == 1000.0


class TestHangingPhase:
    def test_hang_is_killed_and_finished_phases_survive(self):
        """The REAL subprocess/kill/re-emit machinery against a phase
        that sleeps forever: the run must finish well inside the fake
        phase's 600s sleep, kill it at its 3s timeout, and the LAST
        stdout line must carry both fast phases' values."""
        env = dict(os.environ)
        env["BENCH_FAKE_PHASES"] = "1"
        env["BENCH_DEADLINE_S"] = "120"
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=90, env=env)
        assert out.returncode == 0
        lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
        # one line per emit: initial + after each of the 3 phases
        assert len(lines) == 4
        final = json.loads(lines[-1])
        assert len(lines[-1]) < 1500
        # the hang phase contributed nothing; both fast phases did,
        # including the one AFTER the hang
        assert final["value"] == 123.45
        assert final["extra"]["reg_ips"] == 77.0
        assert final["extra"]["done"] == ["fake_fast", "fake_fast2"]
        # every intermediate line parses too (last-line-wins protocol)
        for ln in lines:
            json.loads(ln)

    def test_real_phase_child_reports_cpu_fallback(self, tmp_path):
        """A real phase child on this CPU-only test box must refuse to
        record CPU throughput as the TPU metric."""
        out_path = str(tmp_path / "phase.json")
        env = dict(os.environ)
        env.pop("BENCH_ALLOW_CPU", None)
        env["BENCH_FORCE_CPU"] = "1"
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--phase", "reg_ips", "--out", out_path],
            timeout=120, env=env, check=True)
        with open(out_path) as f:
            res = json.load(f)
        assert res == {"error": "cpu_fallback"}


class TestPhaseOrder:
    def test_probe_is_last_and_headline_leads_device_phases(self):
        names = [n for n, _, _ in bench.PHASES]
        # the device-free cpu baseline runs first (a dead tunnel cannot
        # hang it); headline is the first DEVICE phase; probe is last
        assert names[0] == "cpu_base"
        assert "cpu_base" in bench.NO_DEVICE_PHASES
        device_names = [n for n in names
                        if n not in bench.NO_DEVICE_PHASES]
        assert device_names[0] == "headline"
        assert names[-1] == "probe"

    def test_cpu_base_phase_runs_without_device(self, tmp_path):
        """The device-free phase must produce its number even when the
        backend would be refused (no BENCH_ALLOW_CPU)."""
        out_path = str(tmp_path / "cpu.json")
        env = dict(os.environ)
        env.pop("BENCH_ALLOW_CPU", None)
        env["BENCH_FORCE_CPU"] = "1"
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--phase", "cpu_base", "--out", out_path],
            timeout=300, env=env, check=True)
        with open(out_path) as f:
            res = json.load(f)
        assert res.get("cpu", 0) > 0
