"""Pipeline-A integration: preprocess-produced CSVs -> windowing -> XceptionTime
training via the CLI (the reference's root train.py flow, working end to end)."""

import os

import numpy as np
import pytest

from cvsd_tpu.cli import train_tabular
from cvsd_tpu.config import get_default_config
from cvsd_tpu.data.video import write_test_video
from cvsd_tpu.pipeline import preprocess_ucf_crime


@pytest.mark.slow
def test_preprocess_to_tabular_training(tmp_path, capsys):
    # build a mini UCF-Crime layout with enough frames for seq_len-16 windows
    d = tmp_path / "ucf"
    (d / "Shoplifting").mkdir(parents=True)
    (d / "Shopping").mkdir()
    write_test_video(str(d / "Shoplifting" / "Shoplifting001_x264.mp4"),
                     num_frames=40, width=320, height=240)
    write_test_video(str(d / "Shopping" / "Shopping001_x264.mp4"),
                     num_frames=40, width=320, height=240, seed=1)
    (d / "Anomaly_Train.txt").write_text(
        "Shoplifting/Shoplifting001_x264.mp4\nShopping/Shopping001_x264.mp4"
    )
    cfg = get_default_config()
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34, batch_size=8,
                           conf_threshold=0.0, max_detections=4, dtype="float32")
    out = str(tmp_path / "csvs")
    os.makedirs(out, exist_ok=True)
    stats = preprocess_ucf_crime(cfg, str(d), output_dir=out, verbose=False)
    assert stats["rows"] > 0

    model_path = str(tmp_path / "xt.msgpack")
    train_tabular.main([
        "--csv", os.path.join(out, "ucf-crime_dataset.csv"),
        os.path.join(out, "ucf-crime_dataset-normal.csv"),
        "--seq_len", "16", "--stride", "8", "--epochs", "2",
        "--batch_size", "8", "--nf", "4", "--output", model_path,
    ])
    assert os.path.exists(model_path)
    printed = capsys.readouterr().out
    assert "train_acc" in printed

    # reload and predict on fresh windows
    from cvsd_tpu.models.xception_time import XceptionTimeClassifier, windows_from_bbox_csv

    clf = XceptionTimeClassifier.load(model_path)
    X, y = windows_from_bbox_csv(
        [os.path.join(out, "ucf-crime_dataset.csv")], seq_len=16, stride=8
    )
    preds = clf.predict(X)
    assert preds.shape == y.shape
