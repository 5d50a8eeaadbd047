"""Host allocator hygiene (utils/hostmem.py) — the round-4 soak-leak fix."""

import numpy as np

from cvsd_tpu.utils import hostmem


def test_malloc_trim_runs_on_glibc():
    # allocate + free some churn so the arena has something to give back
    for _ in range(4):
        _ = [np.zeros(300_000, np.uint8) for _ in range(8)]
    assert hostmem.malloc_trim() is True


def test_disable_env_respected(monkeypatch):
    monkeypatch.setenv("CVSD_DISABLE_MALLOC_TRIM", "1")
    assert hostmem.malloc_trim() is False


def test_maybe_malloc_trim_time_gated(monkeypatch):
    monkeypatch.setattr(hostmem, "_last_trim", 0.0)
    assert hostmem.maybe_malloc_trim(min_interval_s=3600.0) is True
    # second call inside the interval must be a no-op
    assert hostmem.maybe_malloc_trim(min_interval_s=3600.0) is False


def test_streaming_pass_trims(monkeypatch, tmp_path):
    """stream_videos_concurrent calls malloc_trim once per pass (the shipped
    fix for the +83 MB/pass RSS ratchet, artifacts/soak_streaming.json)."""
    calls = {"n": 0}

    def fake_trim():
        calls["n"] += 1
        return True

    import cvsd_tpu.pipeline.streaming as streaming

    monkeypatch.setattr(streaming, "malloc_trim", fake_trim)
    # empty path list: no videos needed — the trim is unconditional per pass
    import jax

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.eval.evaluate import ShopformerScorer
    from cvsd_tpu.models.shopformer import build_shopformer

    cfg = get_default_config()
    cfg["model"]["hidden_channels"] = 8
    cfg["detector"].update(img_size=64, width_mult=0.25, depth_mult=0.34,
                           batch_size=2, dtype="float32")
    model = build_shopformer(cfg)
    scorer = ShopformerScorer(model, model.init_variables(jax.random.PRNGKey(0)), cfg)
    pipe = streaming.StreamingPipeline(cfg, scorer=scorer)
    out = pipe.stream_videos_concurrent([])
    assert out["videos"] == 0
    assert calls["n"] == 1
