"""Pose augmentation — batched, jittable JAX transforms (TPU path) plus a
NumPy per-sequence augmentor for parity/host use.

Capability parity with the reference augmentation suite
(/root/reference/shopformer_2/data/poselift_dataset.py:94-285 and
shopformer/data/poselift_dataset.py:40-197): 3x3 affine (flip/scale/rotation/
shear/translation), COCO flip-pair swap, coordinate jitter, temporal dropout,
keypoint dropout. Also covers v1's batch-level ``PoseAugmentation``
(shopformer/train.py:68-186) since ``batched_augment`` operates on whole
batches on device.

TPU-first: the reference augments one sequence at a time inside
``__getitem__`` with Python loops over frames/keypoints; here the entire
batch is augmented inside the jitted train step — one fused XLA program, no
host round-trip, keyed by ``jax.random`` for reproducibility.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

COCO_KEYPOINT_FLIP_PAIRS = (
    (1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16),
)


def flip_permutation(num_keypoints: int) -> np.ndarray:
    """Index permutation implementing the left/right keypoint swap.
    The neck (17) is central and maps to itself."""
    perm = np.arange(num_keypoints)
    for l, r in COCO_KEYPOINT_FLIP_PAIRS:
        if l < num_keypoints and r < num_keypoints:
            perm[l], perm[r] = r, l
    return perm


def affine_matrix(
    sx: float = 1.0,
    sy: float = 1.0,
    tx: float = 0.0,
    ty: float = 0.0,
    rot: float = 0.0,
    shearx: float = 0.0,
    sheary: float = 0.0,
    flip: bool = False,
) -> np.ndarray:
    """3x3 affine transform (reference: shopformer_2/data/poselift_dataset.py:94-131)."""
    cos_r = math.cos(math.radians(rot))
    sin_r = math.sin(math.radians(rot))
    f = -1.0 if flip else 1.0
    return np.array(
        [
            [sx * f * cos_r - sheary * sy * sin_r, shearx * sx * f * cos_r - sy * sin_r, tx * cos_r - ty * sin_r],
            [sx * f * sin_r + sheary * sy * cos_r, shearx * sx * f * sin_r + sy * cos_r, tx * sin_r + ty * cos_r],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )


def apply_affine(pose_seq: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Apply a 3x3 affine to a (T, V, C>=2) sequence; extra channels untouched
    (reference: shopformer_2/data/poselift_dataset.py:134-155)."""
    out = pose_seq.copy()
    coords = pose_seq[:, :, :2]
    coords_h = np.concatenate([coords, np.ones((*coords.shape[:2], 1), coords.dtype)], axis=-1)
    out[:, :, :2] = np.einsum("tvc,dc->tvd", coords_h, mat[:2, :])
    return out


def flip_keypoints(pose_seq: np.ndarray, num_keypoints: int = 17) -> np.ndarray:
    """Left/right pair swap after horizontal flip
    (reference: shopformer_2/data/poselift_dataset.py:158-167)."""
    return pose_seq[:, flip_permutation(num_keypoints)]


class PoseAugmentor:
    """NumPy per-sequence augmentor (host path / golden reference for the
    batched JAX version). Same knobs as the reference PoseAugmentor
    (shopformer_2/data/poselift_dataset.py:170-285)."""

    def __init__(
        self,
        flip_prob: float = 0.5,
        jitter_std: float = 0.02,
        scale_range: Tuple[float, float] = (0.9, 1.1),
        rotation_range: float = 10.0,
        shear_range: float = 0.1,
        translation_range: float = 0.1,
        temporal_dropout_prob: float = 0.1,
        keypoint_dropout_prob: float = 0.0,
        num_keypoints: int = 17,
        seed: int = 0,
    ):
        self.flip_prob = flip_prob
        self.jitter_std = jitter_std
        self.scale_range = tuple(scale_range)
        self.rotation_range = rotation_range
        self.shear_range = shear_range
        self.translation_range = translation_range
        self.temporal_dropout_prob = temporal_dropout_prob
        self.keypoint_dropout_prob = keypoint_dropout_prob
        self.num_keypoints = num_keypoints
        self.rng = np.random.default_rng(seed)

    @classmethod
    def from_config(cls, config: Dict[str, Any], seed: int = 0) -> "PoseAugmentor":
        a = config.get("data", {}).get("augment", {})
        rot = a.get("rotation_range", 10.0)
        rot = max(abs(rot[0]), abs(rot[1])) if isinstance(rot, (list, tuple)) else rot
        shear = a.get("shear_range", 0.0)
        shear = max(abs(shear[0]), abs(shear[1])) if isinstance(shear, (list, tuple)) else shear
        trans = a.get("translate_range", 0.0)
        trans = max(abs(trans[0]), abs(trans[1])) if isinstance(trans, (list, tuple)) else trans
        return cls(
            flip_prob=a.get("flip_prob", 0.5),
            jitter_std=a.get("jitter_std", 0.02),
            scale_range=tuple(a.get("scale_range", [0.9, 1.1])),
            rotation_range=rot,
            shear_range=shear,
            translation_range=trans,
            temporal_dropout_prob=a.get("temporal_dropout_prob", 0.1),
            keypoint_dropout_prob=a.get("keypoint_dropout_prob", 0.0),
            num_keypoints=config.get("model", {}).get("num_keypoints", 17),
            seed=seed,
        )

    def __call__(self, pose_seq: np.ndarray) -> np.ndarray:
        rng = self.rng
        do_flip = rng.random() < self.flip_prob
        scale = rng.uniform(*self.scale_range)
        rot = rng.uniform(-self.rotation_range, self.rotation_range)
        shearx = rng.uniform(-self.shear_range, self.shear_range)
        sheary = rng.uniform(-self.shear_range, self.shear_range)
        tx = rng.uniform(-self.translation_range, self.translation_range)
        ty = rng.uniform(-self.translation_range, self.translation_range)
        mat = affine_matrix(scale, scale, tx, ty, rot, shearx, sheary, do_flip)
        out = apply_affine(pose_seq, mat)
        if do_flip:
            out = flip_keypoints(out, self.num_keypoints)
        if self.jitter_std > 0:
            out[:, :, :2] += rng.normal(0, self.jitter_std, out[:, :, :2].shape)
        if self.temporal_dropout_prob > 0:
            tmask = rng.random(out.shape[0]) < self.temporal_dropout_prob
            out[tmask] = 0
        if self.keypoint_dropout_prob > 0:
            kmask = rng.random(out.shape[:2]) < self.keypoint_dropout_prob
            out[kmask] = 0
        return out.astype(pose_seq.dtype)


def time_warp_permutation(key: jax.Array, batch: int, seq_len: int, prob: float) -> jax.Array:
    """(B, T) frame-index permutations implementing the v1 adjacent-frame
    time warp (reference: shopformer/train.py ~:140-160): with probability
    `prob` per sample, swap 1-2 random adjacent frame pairs (applied
    sequentially, so overlapping draws compose exactly like the reference's
    in-place swaps)."""
    kw, kn, k1, k2 = jax.random.split(key, 4)
    warp = jax.random.bernoulli(kw, prob, (batch,)) & (seq_len > 2)
    num_swaps = jax.random.randint(kn, (batch,), 1, 3)  # 1 or 2
    t = jnp.arange(seq_len)
    perm = jnp.broadcast_to(t, (batch, seq_len))

    def apply_swap(perm, idx, active):
        at_i = t[None, :] == idx[:, None]
        at_i1 = t[None, :] == (idx[:, None] + 1)
        val_i = jnp.take_along_axis(perm, idx[:, None], axis=1)
        val_i1 = jnp.take_along_axis(perm, idx[:, None] + 1, axis=1)
        swapped = jnp.where(at_i, val_i1, jnp.where(at_i1, val_i, perm))
        return jnp.where(active[:, None], swapped, perm)

    idx1 = jax.random.randint(k1, (batch,), 0, max(seq_len - 1, 1))
    idx2 = jax.random.randint(k2, (batch,), 0, max(seq_len - 1, 1))
    perm = apply_swap(perm, idx1, warp)
    perm = apply_swap(perm, idx2, warp & (num_swaps == 2))
    return perm


def batched_time_warp(key: jax.Array, poses: jax.Array, prob: float) -> jax.Array:
    """Apply the adjacent-frame time warp to a (B, T, V, C) batch."""
    B, T = poses.shape[:2]
    perm = time_warp_permutation(key, B, T, prob)
    return jnp.take_along_axis(poses, perm[:, :, None, None], axis=1)


def batched_mixup(key: jax.Array, poses: jax.Array, alpha: float) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batch-level mixup (reference: shopformer/train.py ~:165-186): one
    lam ~ Beta(alpha, alpha) per batch, blend with a random batch permutation.
    Returns (mixed, lam, perm) so callers/tests can reproduce the blend."""
    kl, kp = jax.random.split(key)
    lam = jax.random.beta(kl, alpha, alpha)
    perm = jax.random.permutation(kp, poses.shape[0])
    mixed = lam * poses + (1.0 - lam) * poses[perm]
    return mixed.astype(poses.dtype), lam, perm


def batched_augment(
    key: jax.Array,
    poses: jax.Array,  # (B, T, V, C)
    flip_prob: float = 0.5,
    jitter_std: float = 0.01,
    scale_range: Tuple[float, float] = (0.9, 1.1),
    rotation_range: float = 10.0,
    shear_range: float = 0.0,
    translation_range: float = 0.0,
    temporal_dropout_prob: float = 0.1,
    keypoint_dropout_prob: float = 0.05,
    time_warp_prob: float = 0.0,
    mixup_alpha: float = 0.0,
) -> jax.Array:
    """Jittable whole-batch augmentation; runs fused inside the train step.

    Per-sample random affine (flip/scale/rotation/shear/translation), flip-pair
    swap, coordinate jitter, temporal + keypoint dropout — vectorized over the
    batch with no Python loops (vs the reference's per-frame/per-keypoint
    loops, shopformer_2/data/poselift_dataset.py:233-285).
    """
    B, T, V, C = poses.shape
    ks = jax.random.split(key, 11)
    flip = jax.random.bernoulli(ks[0], flip_prob, (B,))
    scale = jax.random.uniform(ks[1], (B,), minval=scale_range[0], maxval=scale_range[1])
    rot = jnp.deg2rad(jax.random.uniform(ks[2], (B,), minval=-rotation_range, maxval=rotation_range))
    shearx = jax.random.uniform(ks[3], (B,), minval=-shear_range, maxval=shear_range)
    sheary = jax.random.uniform(ks[4], (B,), minval=-shear_range, maxval=shear_range)
    txy = jax.random.uniform(ks[5], (B, 2), minval=-translation_range, maxval=translation_range)

    cos_r, sin_r = jnp.cos(rot), jnp.sin(rot)
    f = jnp.where(flip, -1.0, 1.0)
    sx = sy = scale
    # rows of the 2x3 affine, batched: (B, 2, 3)
    m00 = sx * f * cos_r - sheary * sy * sin_r
    m01 = shearx * sx * f * cos_r - sy * sin_r
    m02 = txy[:, 0] * cos_r - txy[:, 1] * sin_r
    m10 = sx * f * sin_r + sheary * sy * cos_r
    m11 = shearx * sx * f * sin_r + sy * cos_r
    m12 = txy[:, 0] * sin_r + txy[:, 1] * cos_r
    mat = jnp.stack(
        [jnp.stack([m00, m01, m02], -1), jnp.stack([m10, m11, m12], -1)], axis=1
    )  # (B, 2, 3)

    coords = poses[..., :2]
    coords_h = jnp.concatenate([coords, jnp.ones((B, T, V, 1), poses.dtype)], axis=-1)
    new_coords = jnp.einsum("btvc,bdc->btvd", coords_h, mat.astype(poses.dtype))

    # flip-pair swap where flipped
    perm = jnp.asarray(flip_permutation(V))
    swapped = new_coords[:, :, perm]
    new_coords = jnp.where(flip[:, None, None, None], swapped, new_coords)

    if jitter_std > 0:
        new_coords = new_coords + jitter_std * jax.random.normal(ks[6], new_coords.shape, poses.dtype)

    out = jnp.concatenate([new_coords, poses[..., 2:]], axis=-1) if C > 2 else new_coords

    if temporal_dropout_prob > 0:
        tmask = jax.random.bernoulli(ks[7], temporal_dropout_prob, (B, T))
        out = jnp.where(tmask[:, :, None, None], 0.0, out)
    if keypoint_dropout_prob > 0:
        kmask = jax.random.bernoulli(ks[8], keypoint_dropout_prob, (B, T, V))
        out = jnp.where(kmask[..., None], 0.0, out)
    # v1 batch-level extras, in the reference's order: warp then mixup last
    # (shopformer/train.py:68-186)
    if time_warp_prob > 0:
        out = batched_time_warp(ks[9], out, time_warp_prob)
    if mixup_alpha > 0 and B > 1:
        out, _, _ = batched_mixup(ks[10], out, mixup_alpha)
    return out


def batched_augment_from_config(key: jax.Array, poses: jax.Array, config: Dict[str, Any]) -> jax.Array:
    a = config.get("data", {}).get("augment", {})

    def sym(v, default=0.0):
        v = a.get(v, default)
        return max(abs(v[0]), abs(v[1])) if isinstance(v, (list, tuple)) else abs(v)

    return batched_augment(
        key,
        poses,
        flip_prob=a.get("flip_prob", 0.5),
        jitter_std=a.get("jitter_std", 0.01),
        scale_range=tuple(a.get("scale_range", [0.9, 1.1])),
        rotation_range=sym("rotation_range", 10.0),
        shear_range=sym("shear_range", 0.0),
        translation_range=sym("translate_range", 0.0),
        temporal_dropout_prob=a.get("temporal_dropout_prob", 0.1),
        keypoint_dropout_prob=a.get("keypoint_dropout_prob", 0.05),
        time_warp_prob=a.get("time_warp_prob", 0.0),
        mixup_alpha=a.get("mixup_alpha", 0.0),
    )
