"""Reference-code-in-the-loop import validation (VERDICT r3 #5).

Runs the reference's ACTUAL training code (/root/reference/shopformer/
train.py and /root/reference/shopformer_2/train.py, torch CPU) to produce
byte-real checkpoints, scores held-out data with the reference's own model
code, then imports the checkpoints through utils/shopformer_import and
asserts per-sequence score agreement and AUC parity. Unlike
test_shopformer_import.py (independent torch mirrors), nothing here is a
mirror: the weights, configs, and reference-side scores all come from the
reference's own code paths.
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo absent"),
]


def _run(cwd: str, code: str, timeout: int = 900) -> str:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # pure-torch subprocess
    proc = subprocess.run([sys.executable, "-c", textwrap.dedent(code)],
                          cwd=cwd, env=env, capture_output=True, text=True,
                          timeout=timeout)
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc.stdout


@pytest.fixture(scope="module")
def ref_v1(tmp_path_factory):
    """Train the reference v1 on its own synthetic data, then score a seeded
    synthetic test set with the reference's own evaluate code."""
    out = str(tmp_path_factory.mktemp("refv1"))
    _run(f"{REF}/shopformer", f"""
        import sys, numpy as np, torch
        np.random.seed(7); torch.manual_seed(7)
        sys.argv = ['train.py', '--use_synthetic', '--output_dir', {out!r},
                    '--device', 'cpu', '--stage1_epochs', '2',
                    '--stage2_epochs', '2', '--seq_len', '12',
                    '--batch_size', '64', '--no-augment']
        import runpy
        runpy.run_path('train.py', run_name='__main__')
    """)
    _run(f"{REF}/shopformer", f"""
        import sys, numpy as np, torch
        np.random.seed(123); torch.manual_seed(0)
        sys.path.insert(0, '.')
        from evaluate import load_model, evaluate_model
        from data.poselift_dataset import SyntheticPoseLiftDataset
        model, device, config, ckpt = load_model(
            {out!r} + '/best_model.pt', {out!r} + '/config.json', 'cpu')
        ds = SyntheticPoseLiftDataset(num_samples=100,
                                      seq_len=config['seq_len'],
                                      anomaly_ratio=0.3)
        poses = np.stack(ds.samples).astype(np.float32)
        labels = np.asarray(ds.labels)
        scores, labels2 = evaluate_model(model, ds, device)
        assert (labels == labels2).all()
        from utils.metrics import compute_auc_roc
        auc, _, _ = compute_auc_roc(labels, np.asarray(scores))
        np.savez({out!r} + '/ref_scores.npz', poses=poses, labels=labels,
                 scores=np.asarray(scores), auc=auc)
    """)
    return out


@pytest.fixture(scope="module")
def ref_v2(tmp_path_factory):
    """Train the reference v2 on a tiny generated PoseLift directory, then
    score its test split with the reference's own model code."""
    root = tmp_path_factory.mktemp("refv2")
    data = str(root / "data")
    out = str(root / "ckpt")
    cfg_path = str(root / "config.yaml")
    # deterministic miniature PoseLift dataset in the documented pickle format
    import pickle

    for sub in ("Pickle_files/Train", "Pickle_files/Test", "Pickle_files/GT"):
        os.makedirs(os.path.join(data, sub))
    rng = np.random.default_rng(42)

    def make_video(n_frames, n_people):
        vid = {}
        base = rng.uniform(120, 180, (n_people, 17, 2))
        for f in range(n_frames):
            frame = {}
            for p in range(n_people):
                k = base[p] + rng.normal(0, 2.0, (17, 2)) + f * 0.5
                kpts = np.concatenate([k, rng.uniform(0.5, 1.0, (17, 1))], 1)
                frame[p] = [np.array([k[:, 0].min(), k[:, 1].min(),
                                      k[:, 0].max(), k[:, 1].max()]), kpts]
            vid[f] = frame
        return vid

    for i in range(3):
        with open(f"{data}/Pickle_files/Train/tr{i}.pkl", "wb") as f:
            pickle.dump(make_video(60, 2), f)
    for i in range(2):
        with open(f"{data}/Pickle_files/Test/te{i}.pkl", "wb") as f:
            pickle.dump(make_video(40, 1), f)
        gt = np.zeros(40)
        gt[20:] = i
        np.save(f"{data}/Pickle_files/GT/te{i}.npy", gt)

    # complete v2 config (their load_config does NOT merge defaults); hidden
    # 32 deliberately non-default so auto-derivation from the embedded nested
    # yaml is actually exercised
    with open(cfg_path, "w") as f:
        f.write(textwrap.dedent(f"""
            model:
              in_channels: 2
              num_keypoints: 18
              seq_len: 12
              num_tokens: 2
              gcae: {{hidden_channels: 32, latent_channels: 8, num_layers: 4, dropout: 0.1}}
              transformer: {{input_dim: 144, d_model: 144, num_heads: 2, num_layers: 2, dim_feedforward: 64, dropout: 0.1}}
            training:
              device: cpu
              optimizer: adam
              stage1: {{epochs: 2, learning_rate: 1.0e-4, weight_decay: 0}}
              stage2: {{epochs: 2, learning_rate: 1.0e-4, weight_decay: 0}}
              batch_size: 8
              gradient_accumulation: 1
              grad_clip: 1.0
              scheduler: {{type: none, gamma: 0.95, warmup_epochs: 0, min_lr: 1.0e-6, step_size: 10, factor: 0.5, patience: 5}}
              early_stopping: {{enabled: false, patience: 20, min_delta: 0.001}}
            data:
              data_dir: {data}
              stride: 6
              normalize: true
              include_confidence: false
              augmentation: {{enabled: false}}
            checkpoint: {{save_dir: checkpoints, save_best: true, save_last: true, save_frequency: 10}}
            logging: {{log_interval: 10, use_tensorboard: false}}
        """))
    _run(f"{REF}/shopformer_2", f"""
        import sys, numpy as np, torch
        np.random.seed(7); torch.manual_seed(7)
        sys.argv = ['train.py', '--config', {cfg_path!r}, '--output-dir', {out!r}]
        import runpy
        runpy.run_path('train.py', run_name='__main__')
    """)
    _run(f"{REF}/shopformer_2", f"""
        import sys, numpy as np, torch
        sys.path.insert(0, '.')
        np.random.seed(123); torch.manual_seed(0)
        from utils.config import load_config
        from data.poselift_dataset import PoseLiftDataset
        from models.shopformer import build_shopformer
        cfg = load_config({out!r} + '/config.yaml')
        ckpt = torch.load({out!r} + '/stage2_best.pt', map_location='cpu',
                          weights_only=False)
        model = build_shopformer(ckpt.get('config', cfg))
        model.load_state_dict(ckpt['model_state_dict'])
        model.eval()
        ds = PoseLiftDataset.from_config(cfg, split='test')
        poses = torch.stack([ds[i][0] for i in range(len(ds))])
        labels = np.array([int(ds[i][1]) for i in range(len(ds))])
        with torch.no_grad():
            scores = model.compute_anomaly_score(poses).numpy()
        np.savez({out!r} + '/ref_scores.npz', poses=poses.numpy(),
                 labels=labels, scores=scores)
    """)
    return out


def test_v1_checkpoint_scores_match_reference(ref_v1):
    """Import the reference-trained v1 best_model.pt; per-sequence anomaly
    scores and AUC must match the reference's own evaluate.py output."""
    from cvsd_tpu.utils.metrics import compute_auc_roc
    from cvsd_tpu.utils.shopformer_import import (
        import_shopformer_checkpoint, reference_model_config)

    refcfg = json.load(open(os.path.join(ref_v1, "config.json")))
    mc = reference_model_config(
        "v1", num_keypoints=refcfg["num_keypoints"],
        seq_len=refcfg["seq_len"], num_tokens=refcfg["num_tokens"],
        hidden_channels=refcfg["hidden_channels"],
        latent_channels=refcfg["latent_channels"],
        num_heads=refcfg["transformer_heads"],
        num_encoder_layers=refcfg["transformer_layers"],
        num_decoder_layers=refcfg["transformer_layers"],
        dim_feedforward=refcfg["transformer_ff_dim"])
    model, variables, _cfg = import_shopformer_checkpoint(
        os.path.join(ref_v1, "best_model.pt"), model_cfg=mc,
        allow_unsafe_load=True)  # our own just-trained file; contains optimizer state
    z = np.load(os.path.join(ref_v1, "ref_scores.npz"))
    ours = np.asarray(model.apply(variables, z["poses"],
                                  method="compute_anomaly_score"))
    np.testing.assert_allclose(ours, z["scores"], rtol=1e-4, atol=1e-5)
    our_auc = compute_auc_roc(z["labels"], ours)[0]
    assert abs(our_auc - float(z["auc"])) < 1e-6


def test_v2_checkpoint_scores_match_reference(ref_v2):
    """Import the reference-trained v2 stage2_best.pt with NO explicit model
    config — derived from the checkpoint's embedded nested yaml (hidden 32
    must be picked up from model.gcae.hidden_channels) — and match the
    reference's own compute_anomaly_score per sequence."""
    from cvsd_tpu.utils.shopformer_import import import_shopformer_checkpoint

    model, variables, cfg = import_shopformer_checkpoint(
        os.path.join(ref_v2, "stage2_best.pt"), allow_unsafe_load=True)
    assert int(cfg["model"]["hidden_channels"]) == 32
    z = np.load(os.path.join(ref_v2, "ref_scores.npz"))
    ours = np.asarray(model.apply(variables, z["poses"],
                                  method="compute_anomaly_score"))
    np.testing.assert_allclose(ours, z["scores"], rtol=1e-4, atol=1e-5)


def test_v1_imported_checkpoint_finetunes(ref_v1):
    """The imported reference checkpoint must be trainable in this framework
    (MIGRATION.md promise: imported checkpoints fine-tune with zero flags)."""
    import jax

    from cvsd_tpu.utils.shopformer_import import (
        import_shopformer_checkpoint, reference_model_config)

    refcfg = json.load(open(os.path.join(ref_v1, "config.json")))
    mc = reference_model_config(
        "v1", num_keypoints=refcfg["num_keypoints"], seq_len=refcfg["seq_len"],
        num_tokens=refcfg["num_tokens"],
        hidden_channels=refcfg["hidden_channels"],
        latent_channels=refcfg["latent_channels"])
    model, variables, _cfg = import_shopformer_checkpoint(
        os.path.join(ref_v1, "best_model.pt"), model_cfg=mc,
        allow_unsafe_load=True)
    z = np.load(os.path.join(ref_v1, "ref_scores.npz"))
    poses = z["poses"][:16]

    def loss_fn(params):
        return model.apply({"params": params,
                            "batch_stats": variables.get("batch_stats", {})},
                           poses, train=True, method="compute_gcae_loss",
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(0)})[0]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0
