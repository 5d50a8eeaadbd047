import jax.numpy as jnp
import numpy as np

from cvsd_tpu.data.bbox_schema import BBox, append_bboxes
from cvsd_tpu.data.ucf_dataset import UCFCrimeDataset, mil_ranking_loss


def test_ucf_dataset(tmp_path):
    rows = [BBox(1, "v", f, 1.0, 0.5, 0.5, 0.1, 0.2, True, "Shoplifting") for f in range(1, 101)]
    p = str(tmp_path / "a.csv")
    append_bboxes(p, rows)
    ds = UCFCrimeDataset([p], seq_len=64, stride=32)
    assert len(ds) == 2
    x, y = ds[0]
    assert x.shape == (64, 4) and y == 1
    assert ds.class_counts() == {1: 2}


def test_mil_ranking_loss_orders_correctly():
    # perfect separation: anomaly bags score high, normal low -> hinge = 0
    a = jnp.asarray([[0.1, 0.9, 0.2], [0.8, 0.3, 0.1]])
    n = jnp.asarray([[0.0, 0.1, 0.0], [0.1, 0.0, 0.0]])
    good = float(mil_ranking_loss(a, n, sparsity_weight=0.0, smoothness_weight=0.0))
    bad = float(mil_ranking_loss(n, a, sparsity_weight=0.0, smoothness_weight=0.0))
    assert good < bad
    assert good >= 0.0
    # regularizers increase the loss
    with_reg = float(mil_ranking_loss(a, n))
    assert with_reg > good
