"""bench.py relay-resilience helpers: the advisory TPU lock shared with
tools/tpu_queue.sh and the stale-capture fallback used when the relay is
down at the driver's round-end capture. Fast, no JAX involved."""

import json
import os

import pytest

import bench


@pytest.fixture()
def art(tmp_path, monkeypatch):
    d = tmp_path / "artifacts"
    d.mkdir()
    monkeypatch.setattr(bench, "_artifacts_dir", lambda: str(d))
    return d


class TestTpuLock:
    def test_acquires_when_free_and_releases(self, art):
        release = bench._acquire_tpu_lock()
        lock = art / "tpu.lock"
        assert release is not None
        assert lock.exists() and lock.read_text().split()[0] == str(os.getpid())
        release()
        assert not lock.exists()

    def test_reclaims_stale_lock_from_dead_pid(self, art):
        (art / "tpu.lock").write_text("999999 dead_holder\n")
        release = bench._acquire_tpu_lock()
        assert release is not None
        assert (art / "tpu.lock").read_text().split()[0] == str(os.getpid())
        release()

    def test_bounded_wait_on_live_holder_then_proceeds(self, art, monkeypatch):
        # pid 1 (init) is always alive; bench must neither steal nor remove
        # its lock, and must give up after BENCH_LOCK_WAIT seconds
        (art / "tpu.lock").write_text("1 other_client\n")
        monkeypatch.setenv("BENCH_LOCK_WAIT", "0")
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        assert bench._acquire_tpu_lock() is None
        assert (art / "tpu.lock").read_text().split()[0] == "1"

    def test_queue_invoker_bypasses(self, art, monkeypatch):
        monkeypatch.setenv("CVSD_TPU_LOCK_HELD", "1")
        assert bench._acquire_tpu_lock() is None
        assert not (art / "tpu.lock").exists()


class TestStaleCaptureFallback:
    def _write(self, art, name, value, mtime=None):
        p = art / name
        p.write_text("bench: stderr-ish preamble\n" + json.dumps({
            "metric": "detect_fps_per_chip", "value": value,
            "unit": "fps", "vs_baseline": value / 30.0,
            "details": {"backend": "tpu"},
        }) + "\n")
        if mtime is not None:
            os.utime(p, (mtime, mtime))
        return p

    def test_none_without_captures(self, art):
        assert bench._latest_queue_capture() is None

    def test_error_captures_do_not_count(self, art):
        (art / "bench_r4.json").write_text(json.dumps(
            {"metric": "detect_throughput", "value": 0.0,
             "details": {"error": "relay unreachable"}}) + "\n")
        assert bench._latest_queue_capture() is None

    def test_picks_newest_real_capture(self, art):
        self._write(art, "bench_r4.json", 1000.0, mtime=1_000_000)
        self._write(art, "bench_r4_final.json", 2000.0, mtime=2_000_000)
        rec = bench._latest_queue_capture()
        assert rec["value"] == 2000.0
        assert rec["details"]["capture_file"] == "bench_r4_final.json"
        assert rec["details"]["captured_at"].endswith("Z")

    def test_corrupt_files_skipped(self, art):
        (art / "bench_bad.json").write_text("{not json\n")
        self._write(art, "bench_r4.json", 1500.0)
        assert bench._latest_queue_capture()["value"] == 1500.0

    def test_stale_fallbacks_never_reingested(self, art):
        # a queue job can tee a previously-emitted stale fallback back into
        # artifacts/; the newest REAL capture must still win even when the
        # stale file is newer
        self._write(art, "bench_r4.json", 1500.0, mtime=1_000_000)
        (art / "bench_r4_final.json").write_text(json.dumps(
            {"metric": "detect_fps_per_chip", "value": 1500.0, "unit": "fps",
             "vs_baseline": 50.0,
             "details": {"backend": "tpu", "stale_capture": True}}) + "\n")
        rec = bench._latest_queue_capture()
        assert rec["details"]["capture_file"] == "bench_r4.json"
        assert "stale_capture" not in rec["details"]
