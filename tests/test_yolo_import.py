"""yolov5u weight import: shape compatibility + numerics vs a torch mirror.

The torch model below is an independent minimal re-implementation of the
yolov5<x>u forward pass (v5 backbone/PAN + v8 DFL head) built from the
published architecture spec — it exists only to verify that
utils/yolo_import.py maps a real-layout state dict onto PersonDetector
(head_variant='v8dfl') with exactly matching numerics.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from cvsd_tpu.models.detector import PersonDetector, _round_ch, decode_predictions_v8
from cvsd_tpu.utils.yolo_import import (
    build_key_map,
    import_yolov5u,
    synthesize_state_dict,
)

W_MULT, D_MULT = 0.25, 0.34  # tiny scale point for CPU speed; same topology


class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None):
        super().__init__()
        if p is None:
            p = (k - 1) // 2
        self.conv = tnn.Conv2d(c1, c2, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 1)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c1, c_, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tnn.Sequential(*[TBottleneck(c_, shortcut) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))


class TDetect(tnn.Module):
    """v8-style Detect for the u-series: returns raw per-level maps."""

    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3), tnn.Conv2d(c2, 4 * reg_max, 1))
            for c in ch
        )
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3), tnn.Conv2d(c3, nc, 1))
            for c in ch
        )
        class TDFL(tnn.Module):
            def __init__(self, c):
                super().__init__()
                self.conv = tnn.Conv2d(c, 1, 1, bias=False)

        self.dfl = TDFL(reg_max)

    def forward(self, feats):
        return [torch.cat((self.cv2[i](x), self.cv3[i](x)), 1) for i, x in enumerate(feats)]


class TYoloV5u(tnn.Module):
    def __init__(self, wm=W_MULT, dm=D_MULT, nc=80):
        super().__init__()
        w = lambda c: _round_ch(c * wm)  # noqa: E731
        d = lambda n: max(1, round(n * dm))  # noqa: E731
        up = lambda: tnn.Upsample(scale_factor=2, mode="nearest")  # noqa: E731
        layers = [
            TConv(3, w(64), 6, 2, 2),                      # 0
            TConv(w(64), w(128), 3, 2),                    # 1
            TC3(w(128), w(128), d(3)),                     # 2
            TConv(w(128), w(256), 3, 2),                   # 3
            TC3(w(256), w(256), d(6)),                     # 4
            TConv(w(256), w(512), 3, 2),                   # 5
            TC3(w(512), w(512), d(9)),                     # 6
            TConv(w(512), w(1024), 3, 2),                  # 7
            TC3(w(1024), w(1024), d(3)),                   # 8
            TSPPF(w(1024), w(1024)),                       # 9
            TConv(w(1024), w(512), 1),                     # 10
            up(),                                          # 11
            tnn.Identity(),                                # 12 concat
            TC3(w(1024), w(512), d(3), False),             # 13
            TConv(w(512), w(256), 1),                      # 14
            up(),                                          # 15
            tnn.Identity(),                                # 16 concat
            TC3(w(512), w(256), d(3), False),              # 17
            TConv(w(256), w(256), 3, 2),                   # 18
            tnn.Identity(),                                # 19 concat
            TC3(w(512), w(512), d(3), False),              # 20
            TConv(w(512), w(512), 3, 2),                   # 21
            tnn.Identity(),                                # 22 concat
            TC3(w(1024), w(1024), d(3), False),            # 23
            TDetect(nc, (w(256), w(512), w(1024))),        # 24
        ]
        self.model = tnn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        x = m[2](m[1](m[0](x)))
        p3 = x = m[4](m[3](x))
        p4 = x = m[6](m[5](x))
        x = m[9](m[8](m[7](x)))
        t5 = m[10](x)
        x = m[13](torch.cat((m[11](t5), p4), 1))
        t4 = m[14](x)
        n3 = m[17](torch.cat((m[15](t4), p3), 1))
        n4 = m[20](torch.cat((m[18](n3), t4), 1))
        n5 = m[23](torch.cat((m[21](n4), t5), 1))
        return self.model[24]([n3, n4, n5])


@pytest.fixture(scope="module")
def tiny_import():
    sd = synthesize_state_dict(depth_mult=D_MULT, width_mult=W_MULT, seed=1)
    model = PersonDetector(img_size=64, width_mult=W_MULT, depth_mult=D_MULT,
                           head_variant="v8dfl", dtype=jnp.float32)
    variables = import_yolov5u(sd, model=model)
    return sd, model, variables


def test_import_covers_every_mapped_param(tiny_import):
    sd, model, variables = tiny_import
    mapped = {k for k, *_ in build_key_map(D_MULT)}
    extra = set(sd) - mapped - {"model.24.dfl.conv.weight"}
    assert not extra, f"spec keys not consumed by the importer: {sorted(extra)[:5]}"
    # every flax param leaf outside nothing (no kpt branch here) got overwritten:
    flat = jax.tree_util.tree_leaves(variables["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_import_rejects_shape_mismatch():
    sd = synthesize_state_dict(depth_mult=D_MULT, width_mult=W_MULT)
    sd["model.0.conv.weight"] = sd["model.0.conv.weight"][:, :1]  # break in-ch
    model = PersonDetector(img_size=64, width_mult=W_MULT, depth_mult=D_MULT,
                           head_variant="v8dfl", dtype=jnp.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_yolov5u(sd, model=model)


def test_import_rejects_missing_keys():
    sd = synthesize_state_dict(depth_mult=D_MULT, width_mult=W_MULT)
    del sd["model.9.cv1.conv.weight"]
    model = PersonDetector(img_size=64, width_mult=W_MULT, depth_mult=D_MULT,
                           head_variant="v8dfl", dtype=jnp.float32)
    with pytest.raises(KeyError):
        import_yolov5u(sd, model=model)


def test_imported_forward_matches_torch_mirror(tiny_import):
    """End-to-end: same state dict through the torch mirror and through the
    flax import produce the same raw head maps (f32, eval mode)."""
    sd, model, variables = tiny_import
    tm = TYoloV5u()
    tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    missing, unexpected = tm.load_state_dict(tsd, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    tm.eval()

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(img).permute(0, 3, 1, 2))
    f_out = model.apply(variables, jnp.asarray(img), train=False)
    for lvl, name in enumerate(("p3", "p4", "p5")):
        t = t_out[lvl].permute(0, 2, 3, 1).numpy()
        f = np.asarray(f_out[name])
        np.testing.assert_allclose(f, t, rtol=2e-4, atol=2e-4, err_msg=name)


def test_v8_decode_matches_numpy_dfl(tiny_import):
    """decode_predictions_v8 reproduces the published DFL decode (softmax
    bin expectation, anchor+0.5 cell centers, ltrb dist2bbox)."""
    sd, model, variables = tiny_import
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    raw = model.apply(variables, jnp.asarray(img), train=False)
    boxes, scores, _ = decode_predictions_v8(raw, num_classes=80, reg_max=16)
    boxes, scores = np.asarray(boxes), np.asarray(scores)

    off = 0
    for name, stride in zip(("p3", "p4", "p5"), (8, 16, 32)):
        x = np.asarray(raw[name], np.float32)
        B, H, W, _ = x.shape
        dist = x[..., :64].reshape(B, H, W, 4, 16)
        e = np.exp(dist - dist.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        d = (p * np.arange(16)).sum(-1)
        gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
        ax, ay = gx + 0.5, gy + 0.5
        ref = np.stack([(ax - d[0, ..., 0]) * stride, (ay - d[0, ..., 1]) * stride,
                        (ax + d[0, ..., 2]) * stride, (ay + d[0, ..., 3]) * stride], -1)
        n = H * W
        np.testing.assert_allclose(boxes[0, off:off + n], ref.reshape(n, 4),
                                   rtol=1e-4, atol=1e-3, err_msg=name)
        sref = 1.0 / (1.0 + np.exp(-x[0, ..., 64]))
        np.testing.assert_allclose(scores[0, off:off + n], sref.reshape(n), rtol=1e-5, atol=1e-6)
        off += n


def test_import_keeps_fresh_keypoint_branch():
    """A pose-enabled v8dfl detector imports backbone/neck/det weights and
    keeps its randomly-initialized keypoint branch."""
    sd = synthesize_state_dict(depth_mult=D_MULT, width_mult=W_MULT)
    model = PersonDetector(img_size=64, width_mult=W_MULT, depth_mult=D_MULT,
                           head_variant="v8dfl", num_keypoints=17, dtype=jnp.float32)
    variables = import_yolov5u(sd, model=model)
    head = variables["params"]["V8DFLHead_0"]
    assert "ConvBNAct_4" in head and "Conv_2" in head  # kpt branch present
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert out["p3"].shape[-1] == 64 + 80 + 17 * 3


def test_import_real_scale_v5m_keymap_shapes_and_numerics():
    """The REAL yolov5mu scale point (width 0.75 / depth 0.67): every key in a
    real-layout state dict maps with matching shapes (channel rounding, C3
    depths d(6)=4 / d(9)=6, DFL head widths), and the imported forward matches
    the torch mirror — so rounding/key-map bugs at the deployment scale can't
    hide behind the tiny CPU-speed point."""
    wm, dm = 0.75, 0.67
    sd = synthesize_state_dict(depth_mult=dm, width_mult=wm, seed=11)
    model = PersonDetector(img_size=64, width_mult=wm, depth_mult=dm,
                           head_variant="v8dfl", dtype=jnp.float32)
    variables = import_yolov5u(sd, model=model)  # raises on any shape mismatch

    mapped = {k for k, *_ in build_key_map(dm)}
    extra = set(sd) - mapped - {"model.24.dfl.conv.weight"}
    assert not extra, f"unconsumed keys at v5m scale: {sorted(extra)[:5]}"

    tm = TYoloV5u(wm=wm, dm=dm)
    tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    missing, unexpected = tm.load_state_dict(tsd, strict=False)
    assert not missing and not unexpected, (missing, unexpected)
    tm.eval()
    rng = np.random.default_rng(13)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(img).permute(0, 3, 1, 2))
    f_out = model.apply(variables, jnp.asarray(img), train=False)
    for lvl, name in enumerate(("p3", "p4", "p5")):
        t = t_out[lvl].permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(f_out[name]), t,
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_import_uses_model_reg_max_for_dfl_check():
    """A non-default reg_max model validates the DFL weight against ITS
    reg_max (utils/yolo_import.py), not a hardcoded 16."""
    sd = synthesize_state_dict(depth_mult=D_MULT, width_mult=W_MULT, reg_max=8)
    model = PersonDetector(img_size=64, width_mult=W_MULT, depth_mult=D_MULT,
                           head_variant="v8dfl", reg_max=8, dtype=jnp.float32)
    variables = import_yolov5u(sd, model=model)
    assert variables["params"]["V8DFLHead_0"]["Conv_0"]["kernel"].shape[-1] == 32


def test_build_detector_reads_reg_max():
    from cvsd_tpu.models.detector import build_detector

    m = build_detector({"detector": {"head_variant": "v8dfl", "reg_max": 8,
                                     "width_mult": 0.25, "depth_mult": 0.34}})
    assert m.reg_max == 8


def test_load_detector_cli_merges_embedded_arch(tmp_path):
    """CLI consumers rebuild the detector from the checkpoint's embedded
    architecture config; explicit --set detector.* overrides still win."""
    from cvsd_tpu.cli.common import load_detector_cli
    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.utils.checkpoint import save_checkpoint

    ckpt = str(tmp_path / "det.msgpack")
    save_checkpoint(ckpt, {"params": {}}, config={"detector": {
        "head_variant": "v8dfl", "width_mult": 0.25, "depth_mult": 0.34,
        "reg_max": 8, "num_classes": 80}})
    cfg = get_default_config()
    _, cfg2 = load_detector_cli(ckpt, cfg, ["detector.width_mult=0.5",
                                            "training.lr=0.1"])
    assert cfg2["detector"]["head_variant"] == "v8dfl"
    assert cfg2["detector"]["reg_max"] == 8
    assert float(cfg2["detector"]["width_mult"]) == 0.5  # CLI override wins
    # original cfg untouched
    assert cfg["detector"].get("head_variant", "anchor_free") != "v8dfl"


def test_import_cli_roundtrip(tmp_path):
    """cli.import_yolo: torch .pt -> framework checkpoint -> rebuilt model
    detects (config embedded, v8dfl head)."""
    import torch

    from cvsd_tpu.cli.import_yolo import main as import_main
    from cvsd_tpu.models.detector import load_detector_checkpoint, make_detect_fn
    from cvsd_tpu.utils.yolo_import import synthesize_state_dict

    sd = synthesize_state_dict(width_mult=0.25, depth_mult=0.34, seed=0)
    pt = str(tmp_path / "tiny.pt")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, pt)
    out = str(tmp_path / "det.msgpack")
    import_main(["--torch_checkpoint", pt, "--output", out,
                 "--img_size", "64", "--width_mult", "0.25", "--depth_mult", "0.34"])

    model, variables, meta = load_detector_checkpoint(out)
    assert model.head_variant == "v8dfl" and model.img_size == 64
    assert meta["source"] == pt
    import jax.numpy as jnp
    detect = make_detect_fn(model, conf_thresh=0.0, max_detections=4, use_pallas=False)
    imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    out_boxes, out_scores, out_valid = detect(variables, imgs)
    assert np.isfinite(np.asarray(out_scores)).all()
