import os

import pytest

from cvsd_tpu.config import (
    apply_overrides,
    get_default_config,
    load_config,
    merge_configs,
    save_config,
    validate_config,
)


def test_defaults_validate():
    validate_config(get_default_config())


def test_merge_is_recursive():
    cfg = merge_configs(get_default_config(), {"model": {"num_heads": 4}})
    assert cfg["model"]["num_heads"] == 4
    assert cfg["model"]["latent_channels"] == 8  # untouched sibling


def test_attribute_access():
    cfg = get_default_config()
    assert cfg.model.d_model if "d_model" in cfg.model else True
    assert cfg.model.num_tokens == 2
    assert cfg.training.lr == pytest.approx(5e-5)


def test_apply_overrides_parses_json():
    cfg = apply_overrides(get_default_config(), ["training.lr=0.001", "model.variant=v1",
                                                 "model.layout=coco", "model.num_keypoints=17",
                                                 "data.augment.enabled=false"])
    assert cfg["training"]["lr"] == 0.001
    assert cfg["model"]["variant"] == "v1"
    assert cfg["data"]["augment"]["enabled"] is False
    validate_config(cfg)


def test_validate_rejects_bad_heads():
    cfg = apply_overrides(get_default_config(), ["model.num_heads=7"])
    with pytest.raises(ValueError, match="divisible"):
        validate_config(cfg)


def test_validate_rejects_layout_mismatch():
    cfg = apply_overrides(get_default_config(), ["model.layout=coco"])  # implies 17 kpts
    with pytest.raises(ValueError, match="keypoints"):
        validate_config(cfg)


def test_yaml_roundtrip_and_relative_datadir(tmp_path):
    data_dir = tmp_path / "mydata"
    data_dir.mkdir()
    cfg_path = tmp_path / "cfg.yaml"
    save_config({"data": {"data_dir": "mydata"}, "model": {"num_heads": 2}}, str(cfg_path))
    cfg = load_config(str(cfg_path))
    assert cfg["data"]["data_dir"] == str(data_dir)
    assert cfg["model"]["num_heads"] == 2
    assert cfg["training"]["lr"] == pytest.approx(5e-5)  # defaults merged under


def test_save_json(tmp_path):
    p = tmp_path / "cfg.json"
    save_config(get_default_config(), str(p))
    assert os.path.exists(p)


def test_streaming_production_config_loads():
    """The shipped production recipe must load and carry its documented
    operating point (configs/streaming_production.yaml)."""
    from cvsd_tpu.config import load_config

    cfg = load_config("configs/streaming_production.yaml")
    d = cfg["detector"]
    assert d["auto_size"] and d["host_letterbox"] == "content"
    assert d["tracker"] == "byte" and int(d["frame_stride"]) == 2
    assert cfg["model"]["num_tokens"] == 4
