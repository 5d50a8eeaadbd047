"""UCFCrimeDataset — windowed dataset over the tabular BBox CSVs + MIL ranking loss.

Capability parity with /root/reference/dataset.py:8-43: a dataset over the
preprocessed CSVs with a cache, a working __len__/__getitem__ (the reference's
__getitem__ returns whole DataFrames and its loader is broken — missing
`self`, dataset.py:28), and the `rank_loss` placeholder (dataset.py:41-43)
implemented for real as the Sultani et al. (CVPR'18, the UCF-Crime paper —
see /root/reference/dataset/ReadMe-Anomaly-Detection.txt) deep-MIL ranking
objective with sparsity and temporal-smoothness terms.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from cvsd_tpu.models.xception_time import windows_from_bbox_csv


class UCFCrimeDataset:
    """Windowed (N, T, C) view over one or more BBox CSVs."""

    def __init__(self, paths: Sequence[str], seq_len: int = 64, stride: int = 32):
        self.paths = list(paths)
        self.seq_len = seq_len
        self.X, self.y = windows_from_bbox_csv(self.paths, seq_len=seq_len, stride=stride)

    def __len__(self) -> int:
        return int(self.X.shape[0])

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        return self.X[idx], int(self.y[idx])

    def class_counts(self) -> Dict[int, int]:
        vals, counts = np.unique(self.y, return_counts=True)
        return dict(zip(vals.tolist(), counts.tolist()))


def mil_ranking_loss(
    anomaly_scores: jnp.ndarray,  # (B, S) segment scores for anomalous bags
    normal_scores: jnp.ndarray,   # (B, S) segment scores for normal bags
    margin: float = 1.0,
    sparsity_weight: float = 8e-5,
    smoothness_weight: float = 8e-5,
) -> jnp.ndarray:
    """Deep-MIL ranking loss (Sultani et al., CVPR'18):
    hinge(margin - max(anomaly bag) + max(normal bag))
    + sparsity(sum of anomaly scores) + smoothness(adjacent segment diffs).
    The reference left this as `pass` (dataset.py:41-43)."""
    a_max = jnp.max(anomaly_scores, axis=-1)
    n_max = jnp.max(normal_scores, axis=-1)
    hinge = jnp.maximum(0.0, margin - a_max + n_max)
    sparsity = jnp.sum(anomaly_scores, axis=-1)
    smooth = jnp.sum(jnp.diff(anomaly_scores, axis=-1) ** 2, axis=-1)
    return jnp.mean(hinge + sparsity_weight * sparsity + smoothness_weight * smooth)
