import numpy as np
import pytest

from cvsd_tpu.data.bbox_schema import BBox, append_bboxes
from cvsd_tpu.models.xception_time import (
    Standardizer,
    XceptionTimeClassifier,
    stratified_split,
    windows_from_bbox_csv,
)


def _make_csv(tmp_path, name, clip, anomaly, n_frames=100, drift=0.0, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    x = 0.5
    for f in range(1, n_frames + 1):
        x += drift + rng.normal(0, 0.002)
        rows.append(BBox(clip, name, f, 1.0, float(x), 0.5, 0.1, 0.3,
                         anomaly, "Shoplifting" if anomaly else "Shopping"))
    p = str(tmp_path / f"{name}.csv")
    append_bboxes(p, rows)
    return p


def test_windows_from_bbox_csv(tmp_path):
    p1 = _make_csv(tmp_path, "a", 1, True)
    p2 = _make_csv(tmp_path, "b", 2, False)
    X, y = windows_from_bbox_csv([p1, p2], seq_len=64, stride=32)
    assert X.shape == (4, 64, 4)  # 2 windows per 100-frame track
    assert sorted(y.tolist()) == [0, 0, 1, 1]


def test_windows_dedupe_double_appended_csv(tmp_path):
    """The CSVs are append-mode (reference parity): preprocessing the same
    directory twice doubles every row. Windowing must be invariant to that
    (drop duplicate frames per track) — a re-run must not fabricate windows
    across the duplicate boundary."""
    p1 = _make_csv(tmp_path, "a", 1, True)
    p2 = _make_csv(tmp_path, "b", 2, False)
    X, y = windows_from_bbox_csv([p1, p2], seq_len=64, stride=32)
    # append the SAME rows again (second preprocess run over the directory)
    _make_csv(tmp_path, "a", 1, True)
    _make_csv(tmp_path, "b", 2, False)
    X2, y2 = windows_from_bbox_csv([p1, p2], seq_len=64, stride=32)
    np.testing.assert_array_equal(X, X2)
    np.testing.assert_array_equal(y, y2)


def test_stratified_split():
    X = np.arange(100).reshape(100, 1, 1).astype(np.float32)
    y = np.array([0] * 80 + [1] * 20)
    Xtr, ytr, Xva, yva = stratified_split(X, y, 0.2, seed=0)
    assert len(Xva) == 20
    assert yva.sum() == 4  # stratified: 20% of each class
    assert len(Xtr) + len(Xva) == 100


def test_standardizer():
    X = np.random.default_rng(0).normal(5, 3, (50, 10, 4)).astype(np.float32)
    s = Standardizer().fit(X)
    Z = s(X)
    np.testing.assert_allclose(Z.mean(axis=(0, 1)), 0, atol=1e-4)
    np.testing.assert_allclose(Z.std(axis=(0, 1)), 1, atol=1e-3)


@pytest.mark.slow
def test_xceptiontime_learns_separable_classes(tmp_path):
    rng = np.random.default_rng(0)
    n = 128
    T, C = 32, 4
    X = rng.normal(0, 0.3, (n, T, C)).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.int32)
    # class 1: strong sinusoidal drift on channel 0
    t = np.linspace(0, 4 * np.pi, T)
    X[y == 1, :, 0] += 2.0 * np.sin(t)
    clf = XceptionTimeClassifier(seq_len=T, num_channels=C, nf=8)
    out = clf.train(X, y, epochs=10, lr=3e-3, batch_size=32)
    assert out["history"][-1]["valid_acc"] >= 0.8
    preds = clf.predict(X)
    assert (preds == y).mean() >= 0.85
    # save / load roundtrip
    p = str(tmp_path / "xt.msgpack")
    clf.save(p)
    clf2 = XceptionTimeClassifier.load(p)
    np.testing.assert_array_equal(clf2.predict(X), preds)


def test_scan_epoch_matches_loop():
    """scan_epoch=True runs the identical batch sequence under one lax.scan
    per epoch; results match the per-step loop up to float reassociation."""
    import numpy as np

    from cvsd_tpu.models.xception_time import XceptionTimeClassifier

    rng = np.random.default_rng(0)
    X = rng.normal(size=(100, 32, 6)).astype(np.float32)
    y = (X.mean((1, 2)) > 0).astype(np.int64)
    a = XceptionTimeClassifier(num_channels=6, seq_len=32, nf=8, seed=1)
    ha = a.train(X, y, epochs=2, batch_size=16, scan_epoch=True)
    b = XceptionTimeClassifier(num_channels=6, seq_len=32, nf=8, seed=1)
    hb = b.train(X, y, epochs=2, batch_size=16, scan_epoch=False)
    la = [r["loss"] for r in ha["history"]]
    lb = [r["loss"] for r in hb["history"]]
    np.testing.assert_allclose(la, lb, rtol=1e-4)
    np.testing.assert_allclose(a.predict_proba(X), b.predict_proba(X),
                               rtol=5e-3, atol=1e-3)
