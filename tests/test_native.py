import threading

import numpy as np
import pytest

from cvsd_tpu import native
from cvsd_tpu.data.bbox_schema import BBox, append_bboxes, read_bboxes

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


def test_native_csv_matches_python(tmp_path):
    """Native writer output must be byte-identical to the Python path."""
    rng = np.random.default_rng(0)
    frames = np.arange(1, 21, dtype=np.int32)
    persons = rng.integers(1, 4, 20).astype(np.float64)
    ltwh = rng.uniform(0, 1, (20, 4)).astype(np.float32).astype(np.float64)

    py_path = str(tmp_path / "py.csv")
    rows = [
        BBox(7, "Shoplifting003_x264.mp4", int(f), float(p), float(l[0]), float(l[1]),
             float(l[2]), float(l[3]), True, "Shoplifting")
        for f, p, l in zip(frames, persons, ltwh)
    ]
    append_bboxes(py_path, rows)

    nat_path = str(tmp_path / "native.csv")
    with native.NativeCsvWriter(nat_path) as w:
        n = w.write_video_rows(7, "Shoplifting003_x264.mp4", frames, persons, ltwh,
                               True, "Shoplifting")
    assert n == 20
    assert open(nat_path, "rb").read() == open(py_path, "rb").read()


def test_native_csv_integral_floats(tmp_path):
    """1.0 must print as '1.0' (Python repr), not '1'."""
    nat_path = str(tmp_path / "n.csv")
    with native.NativeCsvWriter(nat_path) as w:
        w.write_video_rows(1, "v.mp4", np.array([1], np.int32), np.array([2.0]),
                           np.array([[1.0, 0.5, 0.25, 0.0]]), False, "Shopping")
    line = open(nat_path).read().strip()
    assert line == "1,v.mp4,1,2.0,1.0,0.5,0.25,0.0,False,Shopping"
    assert read_bboxes(nat_path)[0].person == 2.0


def test_ring_buffer_producer_consumer():
    rb = native.NativeRingBuffer(slots=3, shape=(4, 4), dtype=np.uint8)
    N = 20
    received = []

    def producer():
        for i in range(N):
            s = rb.acquire_write()
            rb.slot(s)[:] = i
            rb.commit_write(s)
        rb.close()

    t = threading.Thread(target=producer)
    t.start()
    while True:
        s = rb.acquire_read()
        if s < 0:
            break
        received.append(int(rb.slot(s)[0, 0]))
        rb.release_read(s)
    t.join()
    assert received == list(range(N))
    rb.destroy()


def test_ring_buffer_tsan_stress():
    """Race detection (SURVEY §5.3): build the stress harness with
    ThreadSanitizer and run it; TSAN exits non-zero on any data race."""
    import os
    import subprocess

    native_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
    try:
        subprocess.run(["make", "-C", native_dir, "ring_stress_tsan"], check=True,
                       capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"tsan build unavailable: {e}")
    out = subprocess.run([os.path.join(native_dir, "ring_stress_tsan")],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ring stress OK: 20000 items" in out.stdout


def test_ring_buffer_backpressure():
    rb = native.NativeRingBuffer(slots=2, shape=(2,), dtype=np.float32)
    s0 = rb.acquire_write(); rb.commit_write(s0)
    s1 = rb.acquire_write(); rb.commit_write(s1)
    # buffer full; producer would block. Consume one to free a slot.
    r = rb.acquire_read()
    rb.release_read(r)
    s2 = rb.acquire_write()
    assert s2 == r  # the freed slot is reused
    rb.close()
    rb.destroy()
