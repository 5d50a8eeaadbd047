import pickle

import jax
import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.data import (
    PoseAugmentor,
    PoseLiftDataModule,
    PoseLiftDataset,
    SyntheticPoseLiftDataset,
    add_neck_keypoint,
    affine_matrix,
    apply_affine,
    batch_iterator,
    batched_augment,
    flip_keypoints,
)
from cvsd_tpu.data.poselift import check_continuity, normalize_sequence


# ---------- neck keypoint ----------

def test_neck_is_shoulder_midpoint():
    k = np.zeros((17, 3))
    k[5] = [1.0, 2.0, 0.9]
    k[6] = [3.0, 4.0, 0.8]
    out = add_neck_keypoint(k)
    assert out.shape == (18, 3)
    np.testing.assert_allclose(out[17], [2.0, 3.0, 0.85])


def test_neck_fallbacks():
    k = np.zeros((17, 2))
    k[5] = [1.0, 2.0]
    np.testing.assert_allclose(add_neck_keypoint(k)[17], [1.0, 2.0])  # right missing
    k2 = np.zeros((17, 2))
    np.testing.assert_allclose(add_neck_keypoint(k2)[17], [0.0, 0.0])  # both missing


# ---------- normalization ----------

def test_normalize_centers_and_scales(rng):
    seq = rng.uniform(10, 20, (12, 17, 2)).astype(np.float32)
    out = normalize_sequence(seq)
    assert np.abs(out).max() <= 1.0 + 1e-5
    assert abs(out.mean()) < 0.5


def test_normalize_ignores_zero_keypoints(rng):
    seq = rng.uniform(10, 20, (4, 17, 2)).astype(np.float32)
    seq[:, 0] = 0.0  # missing keypoint should not drag the center to origin
    out = normalize_sequence(seq)
    valid = np.any(seq != 0, axis=-1)
    assert np.abs(out[valid]).max() <= 1.0 + 1e-5


def test_continuity():
    assert check_continuity([0, 1, 2, 3], max_gap=5)
    assert check_continuity([0, 5, 10], max_gap=5)
    assert not check_continuity([0, 1, 8], max_gap=5)


# ---------- pickle ingestion / windowing ----------

@pytest.fixture
def poselift_dir(tmp_path, rng):
    """Build a miniature PoseLift directory: 1 train video, 1 test video with GT."""
    for split in ("Train", "Test"):
        (tmp_path / "Pickle_files" / split).mkdir(parents=True)
    (tmp_path / "Pickle_files" / "GT").mkdir()

    def make_video(n_frames, n_people, gap_at=None):
        data = {}
        for f in range(n_frames):
            if gap_at is not None and f in gap_at:
                continue
            frame = {}
            for p in range(n_people):
                kpts = rng.uniform(100, 200, (17, 3))
                frame[p] = [np.array([0, 0, 50, 50]), kpts]
            data[f] = frame
        return data

    with open(tmp_path / "Pickle_files" / "Train" / "cam1_vid1.pkl", "wb") as f:
        pickle.dump(make_video(40, 2), f)
    with open(tmp_path / "Pickle_files" / "Test" / "cam2_vid9.pkl", "wb") as f:
        pickle.dump(make_video(30, 1), f)
    gt = np.zeros(30)
    gt[12:] = 1  # anomalous second half
    np.save(tmp_path / "Pickle_files" / "GT" / "cam2_vid9.npy", gt)
    return tmp_path


def test_poselift_loading_and_windows(poselift_dir):
    ds = PoseLiftDataset(str(poselift_dir), split="train", seq_len=12, stride=6,
                         num_keypoints=18, verbose=False)
    # 2 people x windows over 40 frames: starts 0,6,12,18,24(+12<=40) -> 5 windows each
    assert len(ds) == 10
    assert ds.poses.shape == (10, 12, 18, 2)
    assert ds.labels.sum() == 0  # train all-normal
    assert np.abs(ds.poses).max() <= 1.0 + 1e-5  # normalized


def test_poselift_majority_vote_labels(poselift_dir):
    ds = PoseLiftDataset(str(poselift_dir), split="test", seq_len=12, stride=6,
                         num_keypoints=18, verbose=False)
    # windows at 0..11 (0 anomalous frames), 6..17 (6, not > 6), 12..23 (12), 18..29 (12)
    assert list(ds.labels) == [0, 0, 1, 1]
    info = ds.get_video_info(0)
    assert info["video_id"] == "cam2_vid9"
    assert info["frame_indices"] == list(range(12))


def test_poselift_nan_filtering(poselift_dir, rng):
    bad = {0: {0: [None, np.full((17, 3), np.nan)]}}
    with open(poselift_dir / "Pickle_files" / "Train" / "cam3_bad.pkl", "wb") as f:
        pickle.dump(bad, f)
    ds = PoseLiftDataset(str(poselift_dir), split="train", seq_len=12, stride=6,
                         num_keypoints=18, verbose=False)
    assert len(ds) == 10  # NaN person contributed nothing


def test_poselift_gap_rejection(tmp_path, rng):
    (tmp_path / "Pickle_files" / "Train").mkdir(parents=True)
    data = {}
    for f in list(range(12)) + list(range(30, 42)):  # gap of 18 in the middle
        data[f] = {0: [None, rng.uniform(0, 1, (17, 3))]}
    with open(tmp_path / "Pickle_files" / "Train" / "v.pkl", "wb") as f:
        pickle.dump(data, f)
    ds = PoseLiftDataset(str(tmp_path), split="train", seq_len=12, stride=6,
                         num_keypoints=17, max_gap=5, verbose=False)
    # windows spanning the gap are rejected: only [0..11] and [30..41] survive
    assert len(ds) == 2


# ---------- synthetic ----------

def test_synthetic_deterministic():
    a = SyntheticPoseLiftDataset(32, seed=7)
    b = SyntheticPoseLiftDataset(32, seed=7)
    np.testing.assert_array_equal(a.poses, b.poses)
    np.testing.assert_array_equal(a.labels, b.labels)


def test_synthetic_anomaly_ratio_and_shape():
    ds = SyntheticPoseLiftDataset(200, seq_len=12, num_keypoints=18, anomaly_ratio=0.3, seed=1)
    assert ds.poses.shape == (200, 12, 18, 2)
    assert 0.15 < ds.labels.mean() < 0.45


def test_synthetic_anomalies_move_more():
    ds = SyntheticPoseLiftDataset(400, anomaly_ratio=0.5, seed=3)
    motion = np.abs(np.diff(ds.poses, axis=1)).mean(axis=(1, 2, 3))
    assert motion[ds.labels == 1].mean() > 2 * motion[ds.labels == 0].mean()


# ---------- augmentation ----------

def test_affine_identity():
    seq = np.random.default_rng(0).normal(size=(12, 17, 2)).astype(np.float32)
    out = apply_affine(seq, affine_matrix())
    np.testing.assert_allclose(out, seq, atol=1e-6)


def test_affine_flip_negates_x():
    seq = np.random.default_rng(0).normal(size=(5, 17, 2)).astype(np.float32)
    out = apply_affine(seq, affine_matrix(flip=True))
    np.testing.assert_allclose(out[..., 0], -seq[..., 0], atol=1e-6)
    np.testing.assert_allclose(out[..., 1], seq[..., 1], atol=1e-6)


def test_flip_keypoints_swaps_pairs():
    seq = np.arange(2 * 17 * 2, dtype=np.float32).reshape(2, 17, 2)
    out = flip_keypoints(seq, 17)
    np.testing.assert_array_equal(out[:, 1], seq[:, 2])
    np.testing.assert_array_equal(out[:, 2], seq[:, 1])
    np.testing.assert_array_equal(out[:, 0], seq[:, 0])  # nose unchanged


def test_numpy_augmentor_runs():
    aug = PoseAugmentor(seed=0, num_keypoints=17)
    seq = np.random.default_rng(0).normal(size=(12, 17, 2)).astype(np.float32)
    out = aug(seq)
    assert out.shape == seq.shape and out.dtype == seq.dtype
    assert not np.allclose(out, seq)


def test_batched_augment_identity_when_disabled():
    key = jax.random.PRNGKey(0)
    poses = np.random.default_rng(0).normal(size=(4, 12, 17, 2)).astype(np.float32)
    out = batched_augment(
        key, poses, flip_prob=0.0, jitter_std=0.0, scale_range=(1.0, 1.0),
        rotation_range=0.0, shear_range=0.0, translation_range=0.0,
        temporal_dropout_prob=0.0, keypoint_dropout_prob=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), poses, atol=1e-5)


def test_batched_augment_flip_matches_numpy():
    key = jax.random.PRNGKey(0)
    poses = np.random.default_rng(0).normal(size=(8, 12, 17, 2)).astype(np.float32)
    out = np.asarray(batched_augment(
        key, poses, flip_prob=1.0, jitter_std=0.0, scale_range=(1.0, 1.0),
        rotation_range=0.0, shear_range=0.0, translation_range=0.0,
        temporal_dropout_prob=0.0, keypoint_dropout_prob=0.0,
    ))
    expected = np.stack([flip_keypoints(apply_affine(p, affine_matrix(flip=True)), 17) for p in poses])
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_batched_augment_is_jittable():
    fn = jax.jit(lambda k, p: batched_augment(k, p))
    out = fn(jax.random.PRNGKey(1), np.zeros((2, 12, 18, 2), np.float32))
    assert out.shape == (2, 12, 18, 2)


def test_time_warp_permutation_is_adjacent_swaps():
    """Warp perms must differ from identity only by 1-2 adjacent-frame swaps
    (reference shopformer/train.py v1 PoseAugmentation time warp)."""
    from cvsd_tpu.data.augment import time_warp_permutation

    B, T = 64, 12
    perm = np.asarray(time_warp_permutation(jax.random.PRNGKey(3), B, T, prob=0.5))
    ident = np.arange(T)
    warped = 0
    for b in range(B):
        p = perm[b]
        assert sorted(p.tolist()) == list(range(T))  # a real permutation
        diff = np.where(p != ident)[0]
        if diff.size == 0:
            continue
        warped += 1
        # differing positions decompose into adjacent transpositions:
        # 1 swap -> {i, i+1}; 2 swaps -> up to two such (possibly overlapping,
        # composing to a 3-cycle on consecutive frames)
        assert diff.size in (2, 3, 4), (b, p)
        # every displaced frame moved by at most 2 positions (two overlapping
        # adjacent swaps at most); disjoint swap pairs can be anywhere in T
        assert np.all(np.abs(p - ident)[diff] <= 2)
    assert 0 < warped < B  # prob=0.5: some warped, some untouched


def test_batched_time_warp_gathers_frames():
    from cvsd_tpu.data.augment import batched_time_warp, time_warp_permutation

    poses = np.random.default_rng(0).normal(size=(8, 12, 17, 2)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    out = np.asarray(batched_time_warp(key, poses, prob=1.0))
    perm = np.asarray(time_warp_permutation(key, 8, 12, prob=1.0))
    expected = np.stack([poses[b, perm[b]] for b in range(8)])  # NumPy golden
    np.testing.assert_allclose(out, expected, atol=0)


def test_batched_mixup_matches_numpy_blend():
    from cvsd_tpu.data.augment import batched_mixup

    poses = np.random.default_rng(1).normal(size=(16, 12, 17, 2)).astype(np.float32)
    mixed, lam, perm = batched_mixup(jax.random.PRNGKey(5), poses, alpha=0.4)
    lam, perm = float(lam), np.asarray(perm)
    assert 0.0 <= lam <= 1.0
    assert sorted(perm.tolist()) == list(range(16))
    expected = lam * poses + (1 - lam) * poses[perm]  # NumPy golden
    np.testing.assert_allclose(np.asarray(mixed), expected, atol=1e-6)


def test_batched_augment_with_warp_and_mixup_jits():
    fn = jax.jit(lambda k, p: batched_augment(k, p, time_warp_prob=0.3, mixup_alpha=0.2))
    poses = np.random.default_rng(2).normal(size=(8, 12, 18, 2)).astype(np.float32)
    out = np.asarray(fn(jax.random.PRNGKey(1), poses))
    assert out.shape == poses.shape and np.all(np.isfinite(out))


# ---------- batching ----------

def test_batch_iterator_static_shapes(rng):
    poses = rng.normal(size=(37, 12, 17, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 37).astype(np.int32)
    batches = list(batch_iterator(poses, labels, batch_size=16))
    assert len(batches) == 3
    for b in batches:
        assert b["poses"].shape == (16, 12, 17, 2)
    assert batches[-1]["mask"].sum() == 5  # 37 - 32
    total = sum(int(b["mask"].sum()) for b in batches)
    assert total == 37


def test_batch_iterator_drop_last(rng):
    poses = rng.normal(size=(37, 12, 17, 2)).astype(np.float32)
    batches = list(batch_iterator(poses, batch_size=16, drop_last=True))
    assert len(batches) == 2


def test_batch_iterator_pad_to_multiple(rng):
    poses = rng.normal(size=(20, 12, 17, 2)).astype(np.float32)
    batches = list(batch_iterator(poses, batch_size=6, pad_to_multiple_of=8))
    for b in batches:
        assert b["poses"].shape[0] % 8 == 0


def test_datamodule_synthetic():
    cfg = get_default_config()
    cfg["data"]["dataset"] = "synthetic"
    cfg["data"]["synthetic"]["num_train"] = 64
    cfg["data"]["synthetic"]["num_test"] = 48
    dm = PoseLiftDataModule(cfg).setup()
    stats = dm.get_stats()
    assert stats["num_train"] == 64 and stats["num_test"] == 48
    assert stats["test_anomaly"] > 0
    nb = sum(1 for _ in dm.train_batches())
    assert nb == dm.steps_per_epoch() == 2
    b = next(iter(dm.test_batches()))
    assert b["poses"].shape == (32, 12, 18, 2)
