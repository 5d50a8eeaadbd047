"""In-process smoke tests for the round-3 CLI surfaces
(annotate / export / import_shopformer)."""

import json
import os

import numpy as np
import pytest

import jax

from cvsd_tpu.config import get_default_config
from cvsd_tpu.models.shopformer import build_shopformer
from cvsd_tpu.utils.checkpoint import save_checkpoint

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_scorer_ckpt(tmp_path_factory):
    """A small random-weight Shopformer checkpoint + matching detector cfg."""
    cfg = get_default_config()
    cfg["model"]["hidden_channels"] = 8
    cfg["detector"].update(img_size=128, width_mult=0.25, depth_mult=0.34,
                           batch_size=8, conf_threshold=0.0, max_detections=4,
                           dtype="float32", pose_head=True)
    cfg["data"]["stride"] = 6
    model = build_shopformer(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("ck") / "stage2_best.msgpack")
    save_checkpoint(path, jax.device_get(variables), config=cfg)
    return path, cfg


@pytest.mark.slow
def test_cli_annotate(tiny_scorer_ckpt, tmp_path):
    from cvsd_tpu.cli.annotate import main
    from cvsd_tpu.data.video import write_test_video

    ckpt, _cfg = tiny_scorer_ckpt
    video = write_test_video(str(tmp_path / "v.mp4"), num_frames=24,
                             width=320, height=240)
    out_dir = str(tmp_path / "ann")
    summary = str(tmp_path / "summary.json")
    main(["--checkpoint", ckpt, "--videos", video, "--out-dir", out_dir,
          "--output", summary])
    s = json.load(open(summary))
    assert s[video]["frames"] == 24
    assert os.path.exists(s[video]["out_path"])


def test_cli_export_scorer(tiny_scorer_ckpt, tmp_path):
    from cvsd_tpu.cli.export import main
    from cvsd_tpu.serve.export import call_exported, load_exported

    ckpt, cfg = tiny_scorer_ckpt
    out = str(tmp_path / "scorer.stablehlo")
    main(["--checkpoint", ckpt, "--output", out, "--platforms", "cpu"])
    e = load_exported(out)
    T = int(cfg["model"].get("seq_len", 12))
    V = int(cfg["model"].get("num_keypoints", 18))
    s = np.asarray(call_exported(e, np.zeros((2, T, V, 2), np.float32)))
    assert s.shape == (2,) and np.isfinite(s).all()


def test_cli_import_shopformer(tmp_path):
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_shopformer_import import TShopformer

    from cvsd_tpu.cli.import_shopformer import main
    from cvsd_tpu.eval.evaluate import load_model

    torch.manual_seed(2)
    tm = TShopformer("v2", 18)
    tm.eval()
    pt = str(tmp_path / "stage2_best.pt")
    torch.save({"model_state_dict": tm.state_dict()}, pt)
    out = str(tmp_path / "sf.msgpack")
    main(["--torch_checkpoint", pt, "--variant", "v2", "--output", out])
    scorer = load_model(out)
    poses = np.random.default_rng(0).normal(size=(3, 12, 18, 2)).astype(np.float32)
    s = scorer.score(poses)
    with torch.no_grad():
        *_r, ts = tm(torch.from_numpy(np.transpose(poses, (0, 3, 1, 2))))
    np.testing.assert_allclose(s, ts.numpy(), rtol=1e-4, atol=1e-5)
