"""YOLO-format dataset loader (data/yolo_dataset.py) + train_detector CLI."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cvsd_tpu.data.yolo_dataset import (YOLODetectionDataset, _labels_dir_for,
                                        parse_yolo_label)
from cvsd_tpu.ops.letterbox import letterbox_params


def _make_dataset(root, n=6, w=96, h=64, kpts=0):
    """Tiny YOLO-layout dataset: one centered box per image (+ optional
    keypoint triples), one background image (no label file)."""
    img_dir = os.path.join(root, "images", "train")
    lbl_dir = os.path.join(root, "labels", "train")
    os.makedirs(img_dir), os.makedirs(lbl_dir)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"im{i}.png"), img)
        if i == n - 1:
            continue  # background image: no label file
        cx, cy, bw, bh = 0.5, 0.5, 0.25, 0.5
        line = f"0 {cx} {cy} {bw} {bh}"
        if kpts:
            for k in range(kpts):
                vis = 2 if k % 2 == 0 else 0  # alternate visible/invisible
                line += f" {0.5 + 0.01 * k} 0.5 {vis}"
        extra = "1 0.2 0.2 0.1 0.1"  # non-person class, must be filtered
        if kpts:
            extra += " " + " ".join("0.2 0.2 2" for _ in range(kpts))
        with open(os.path.join(lbl_dir, f"im{i}.txt"), "w") as f:
            f.write(line + "\n" + extra + "\n")
    return img_dir, lbl_dir


def test_labels_dir_convention(tmp_path):
    assert _labels_dir_for("/d/images/train") == "/d/labels/train"
    assert _labels_dir_for("/d/imgs") == "/d/labels"


def test_parse_yolo_label_filters_and_visibility(tmp_path):
    p = str(tmp_path / "l.txt")
    with open(p, "w") as f:
        f.write("0 0.5 0.5 0.2 0.2 0.4 0.4 2 0.6 0.6 0\n2 0.1 0.1 0.05 0.05 0 0 2 0 0 2\n")
    b, k = parse_yolo_label(p, classes=(0,), num_keypoints=2)
    assert b.shape == (1, 4) and k.shape == (1, 2, 2)
    np.testing.assert_allclose(k[0, 0], [0.4, 0.4])
    assert np.isnan(k[0, 1]).all()  # vis=0 -> NaN
    # missing file = background
    b2, _ = parse_yolo_label(str(tmp_path / "missing.txt"))
    assert len(b2) == 0


def test_load_maps_boxes_to_canvas(tmp_path):
    img_dir, _ = _make_dataset(str(tmp_path), n=3, w=96, h=64)
    ds = YOLODetectionDataset(img_dir, img_size=64, max_persons=4)
    img, boxes, valid, _ = ds.load(0)
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert valid.sum() == 1  # class-1 row filtered out
    scale, pad_x, pad_y, _, _ = letterbox_params(64, 96, 64)
    # centered 0.25x0.5 box in a 96x64 image
    exp = [(0.5 - 0.125) * 96 * scale + pad_x, (0.5 - 0.25) * 64 * scale + pad_y,
           (0.5 + 0.125) * 96 * scale + pad_x, (0.5 + 0.25) * 64 * scale + pad_y]
    np.testing.assert_allclose(boxes[0], exp, atol=1e-4)


def test_background_image_has_no_valid(tmp_path):
    img_dir, _ = _make_dataset(str(tmp_path), n=3)
    ds = YOLODetectionDataset(img_dir, img_size=64)
    _, _, valid, _ = ds.load(len(ds) - 1)
    assert valid.sum() == 0


def test_keypoints_mapped_and_invisible_to_center(tmp_path):
    img_dir, _ = _make_dataset(str(tmp_path), n=2, kpts=4)
    ds = YOLODetectionDataset(img_dir, img_size=64, num_keypoints=4)
    _, boxes, valid, kpts = ds.load(0)
    assert valid[0]
    scale, pad_x, pad_y, _, _ = letterbox_params(64, 96, 64)
    np.testing.assert_allclose(kpts[0, 0], [0.5 * 96 * scale + pad_x,
                                            0.5 * 64 * scale + pad_y], atol=1e-4)
    center = [(boxes[0, 0] + boxes[0, 2]) / 2, (boxes[0, 1] + boxes[0, 3]) / 2]
    np.testing.assert_allclose(kpts[0, 1], center, atol=1e-4)  # vis=0 kpt


def test_batches_static_shape_and_padding(tmp_path):
    img_dir, _ = _make_dataset(str(tmp_path), n=5)
    ds = YOLODetectionDataset(img_dir, img_size=64, max_persons=4)
    out = list(ds.batches(batch_size=2, rng=np.random.default_rng(0)))
    assert len(out) == 3
    for imgs, boxes, valid, kpts in out:
        assert imgs.shape == (2, 64, 64, 3)
        assert boxes.shape == (2, 4, 4) and valid.shape == (2, 4)
    # padded slot of the last batch is all-invalid
    total_valid = sum(int(v.sum()) for _, _, v, _ in out)
    assert total_valid == 4  # 4 labeled images (1 background, 1 pad slot)


def test_from_data_yaml(tmp_path):
    img_dir, _ = _make_dataset(str(tmp_path), n=2, kpts=3)
    with open(tmp_path / "data.yaml", "w") as f:
        f.write(f"path: {tmp_path}\ntrain: images/train\nval: images/train\n"
                f"kpt_shape: [3, 3]\nnames:\n  0: person\n")
    ds = YOLODetectionDataset.from_data_yaml(str(tmp_path / "data.yaml"),
                                             split="train", img_size=64)
    assert len(ds) == 2 and ds.num_keypoints == 3


@pytest.mark.slow
def test_train_detector_cli_init_checkpoint(tmp_path):
    """Fine-tune from an existing checkpoint (--init-checkpoint): the
    imported-yolov5u workflow shape. The checkpoint's architecture wins."""
    import jax

    from cvsd_tpu.cli.train_detector import main
    from cvsd_tpu.models.detector import PersonDetector
    from cvsd_tpu.train.detector_train import DetectorTrainer

    img_dir, _ = _make_dataset(str(tmp_path), n=4)
    model = PersonDetector(img_size=64, width_mult=0.25, depth_mult=0.34,
                           num_keypoints=0, dtype=np.float32)
    trainer = DetectorTrainer(model, lr=1e-3)
    init_ckpt = str(tmp_path / "init.msgpack")
    trainer.save(init_ckpt, use_ema=False)

    out_ckpt = str(tmp_path / "tuned.msgpack")
    summary = str(tmp_path / "s.json")
    main(["--images", img_dir, "--steps", "2", "--scan-chunk", "2",
          "--batch", "2", "--init-checkpoint", init_ckpt, "--eval-frac", "0",
          "--save-checkpoint", out_ckpt, "--output", summary])
    import json

    s = json.load(open(summary))
    assert np.isfinite(s["train_loss_last"])
    from cvsd_tpu.models.detector import load_detector_checkpoint

    m2, v2, _ = load_detector_checkpoint(out_ckpt)
    assert m2.img_size == 64 and abs(m2.width_mult - 0.25) < 1e-9
    # weights actually moved from the init point
    p0 = jax.tree_util.tree_leaves(trainer.variables["params"])[0]
    p1 = jax.tree_util.tree_leaves(v2["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
def test_train_detector_cli_end_to_end(tmp_path):
    """The full CLI surface: YOLO dataset -> DetectorTrainer -> checkpoint."""
    img_dir, _ = _make_dataset(str(tmp_path), n=6, kpts=0)
    with open(tmp_path / "data.yaml", "w") as f:
        f.write(f"path: {tmp_path}\ntrain: images/train\nnames:\n  0: person\n")
    from cvsd_tpu.cli.train_detector import main

    ckpt = str(tmp_path / "det.msgpack")
    out = str(tmp_path / "summary.json")
    main(["--data", str(tmp_path / "data.yaml"), "--steps", "2",
          "--scan-chunk", "2", "--batch", "2", "--img", "64",
          "--width", "0.25", "--eval-frac", "0.34",
          "--save-checkpoint", ckpt, "--output", out])
    import json

    s = json.load(open(out))
    assert np.isfinite(s["train_loss_last"]) and "ap50" in s
    from cvsd_tpu.models.detector import load_detector_checkpoint

    model, variables, _ = load_detector_checkpoint(ckpt)
    assert model.img_size == 64


def test_letterbox_padding_is_gray_114(tmp_path):
    """Training canvases must pad with PAD_VALUE (114) like every inference
    letterbox — black padding would be a train/serve distribution mismatch
    (ADVICE r3)."""
    from cvsd_tpu.ops.letterbox import PAD_VALUE

    img_dir, _ = _make_dataset(str(tmp_path), n=2, w=96, h=64)
    ds = YOLODetectionDataset(img_dir, img_size=96, max_persons=2)
    img, _, _, _ = ds.load(0)
    # 96x64 source on a 96x96 canvas: top/bottom bands are pure padding
    pad = np.concatenate([img[:8], img[-8:]])
    np.testing.assert_allclose(pad, PAD_VALUE / 255.0, atol=1e-6)
