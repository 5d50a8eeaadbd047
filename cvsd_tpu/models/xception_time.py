"""XceptionTime — 1-D Inception-style time-series classifier over bbox tracks.

Capability parity with the reference's intended second-stage classifier
(/root/reference/model.py:84-131): window the BBox CSVs into
(n_samples, seq_len, n_channels) with seq_len=64/stride=32, stratified
80/20 split, per-channel standardization (tsai's TSStandardize), train an
XceptionTime-architecture classifier with a one-cycle schedule
(fit_one_cycle(200, 3e-4), model.py:127), export/restore, batch inference.
The reference version is a non-functional stub (undefined `labels`,
model.py:112; fake windowing via np.stack, :111) — this one works.

Architecture follows Rahimian et al.'s XceptionTime as shipped in tsai:
Xception modules = bottleneck 1x1 -> parallel depthwise-separable convs
(k = 39/19/9) + maxpool->1x1 branch, concatenated; residual every block;
head = adaptive-avg-pool -> 1x1 convs -> classes. Layout is feature-last
(B, T, C) so every conv is an MXU-friendly NWC conv.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

BBOX_CHANNELS = ("left", "top", "width", "height")


# ---------------------------------------------------------------- data prep

def windows_from_bbox_csv(
    csv_paths: Sequence[str],
    seq_len: int = 64,
    stride: int = 32,
    min_len: Optional[int] = None,
    return_clips: bool = False,
):
    """BBox CSVs -> ((N, seq_len, 4) float32 windows, (N,) int labels).
    Groups rows by (clip, person) track, sorts by frame, slides windows
    (the real version of model.py:96-111's intent). With return_clips,
    also returns the (N,) int clip id per window — the key for video-level
    score aggregation."""
    from cvsd_tpu.data.bbox_schema import read_bboxes

    min_len = min_len or seq_len
    X: List[np.ndarray] = []
    y: List[int] = []
    clips: List[int] = []
    for path in csv_paths:
        tracks: Dict[Tuple[int, float], List] = {}
        for r in read_bboxes(path):
            tracks.setdefault((r.clip, r.person), []).append(r)
        for rows in tracks.values():
            rows.sort(key=lambda r: r.frame)
            # drop duplicate frames within a track: the CSVs are append-mode
            # (reference parity, model.py:79-81), so a re-run preprocess over
            # the same directory doubles every row; windows built across the
            # duplicate boundary would be garbage
            rows = [r for i, r in enumerate(rows)
                    if i == 0 or r.frame != rows[i - 1].frame]
            feats = np.asarray([[r.left, r.top, r.width, r.height] for r in rows], np.float32)
            label = int(rows[0].is_anomaly)
            if len(feats) < min_len:
                continue
            for s in range(0, len(feats) - seq_len + 1, stride):
                X.append(feats[s : s + seq_len])
                y.append(label)
                clips.append(int(rows[0].clip))
    if not X:
        empty = (np.zeros((0, seq_len, len(BBOX_CHANNELS)), np.float32),
                 np.zeros(0, np.int32))
        return (*empty, np.zeros(0, np.int32)) if return_clips else empty
    out = (np.stack(X), np.asarray(y, np.int32))
    return (*out, np.asarray(clips, np.int32)) if return_clips else out


def stratified_split(
    X: np.ndarray, y: np.ndarray, valid_frac: float = 0.2, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stratified train/valid split (reference model.py:115 intent)."""
    rng = np.random.default_rng(seed)
    train_idx, valid_idx = [], []
    for cls in np.unique(y):
        idx = np.where(y == cls)[0]
        rng.shuffle(idx)
        k = max(1, int(round(len(idx) * valid_frac))) if len(idx) > 1 else 0
        valid_idx.extend(idx[:k])
        train_idx.extend(idx[k:])
    tr = np.asarray(sorted(train_idx))
    va = np.asarray(sorted(valid_idx))
    return X[tr], y[tr], X[va], y[va]


class Standardizer:
    """Per-channel mean/std standardization (tsai TSStandardize, model.py:121)."""

    def __init__(self):
        self.mean: Optional[np.ndarray] = None
        self.std: Optional[np.ndarray] = None

    def fit(self, X: np.ndarray) -> "Standardizer":
        self.mean = X.mean(axis=(0, 1), keepdims=True)
        self.std = X.std(axis=(0, 1), keepdims=True) + 1e-8
        return self

    def __call__(self, X: np.ndarray) -> np.ndarray:
        return (X - self.mean) / self.std


# ---------------------------------------------------------------- model

class XceptionModule(nn.Module):
    nf: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        bottleneck = nn.Conv(self.nf, (1,), use_bias=False, dtype=self.dtype)(x)
        outs = []
        for k in (39, 19, 9):
            # depthwise-separable: depthwise over time + pointwise mix
            dw = nn.Conv(self.nf, (k,), padding="SAME", feature_group_count=self.nf,
                         use_bias=False, dtype=self.dtype)(bottleneck)
            pw = nn.Conv(self.nf, (1,), use_bias=False, dtype=self.dtype)(dw)
            outs.append(pw)
        mp = nn.max_pool(x, (3,), strides=(1,), padding="SAME")
        outs.append(nn.Conv(self.nf, (1,), use_bias=False, dtype=self.dtype)(mp))
        return jnp.concatenate(outs, axis=-1)  # (B, T, 4*nf)


class XceptionBlock(nn.Module):
    nf: int
    depth: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        for d in range(self.depth):
            x = XceptionModule(self.nf * (2 ** d), dtype=self.dtype)(x)
            if d % 2 == 1:
                res = nn.Conv(x.shape[-1], (1,), use_bias=False, dtype=self.dtype)(residual)
                res = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(res)
                x = nn.relu(x + res)
                residual = x
        return x


class XceptionTime(nn.Module):
    """XceptionTime network: block -> avg-pool head -> classes."""

    num_classes: int = 2
    nf: int = 16
    depth: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:  # (B, T, C)
        x = XceptionBlock(self.nf, self.depth, dtype=self.dtype)(x, train)
        # head: pool time to 1, then 1x1 conv stack down to classes
        c = x.shape[-1]
        x = jnp.mean(x, axis=1, keepdims=True)  # adaptive avg pool -> (B, 1, C)
        x = nn.Conv(c // 2, (1,), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(c // 4, (1,), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1,), dtype=self.dtype)(x)
        return x[:, 0, :]  # (B, num_classes) logits


# ---------------------------------------------------------------- trainer

class XceptionTimeClassifier:
    """Train/infer driver with one-cycle schedule and export
    (reference model.py:115-131 train/infer surface, made functional)."""

    def __init__(self, seq_len: int = 64, num_channels: int = 4, num_classes: int = 2,
                 nf: int = 16, seed: int = 0):
        self.seq_len = seq_len
        self.num_channels = num_channels
        self.model = XceptionTime(num_classes=num_classes, nf=nf)
        self.seed = seed
        self.standardizer = Standardizer()
        self.variables = None
        self._fwd = None  # jitted inference fn, built once (see _predict_logits)

    def _init(self):
        dummy = jnp.zeros((2, self.seq_len, self.num_channels), jnp.float32)
        return self.model.init({"params": jax.random.PRNGKey(self.seed)}, dummy, train=False)

    def train(self, X: np.ndarray, y: np.ndarray, epochs: int = 20, lr: float = 3e-4,
              batch_size: int = 64, valid_frac: float = 0.2, verbose: bool = False,
              scan_epoch: bool = True) -> Dict[str, Any]:
        """One-cycle training (tsai fit_one_cycle parity). With scan_epoch
        (default) the whole epoch runs under ONE lax.scan dispatch — per-step
        host syncs cost a full relay round-trip each on remote-attached
        chips (same treatment as training.scan_epoch / train_steps_scan);
        the batch sequence is identical either way."""
        Xtr, ytr, Xva, yva = stratified_split(X, y, valid_frac, self.seed)
        self.standardizer.fit(Xtr)
        Xtr, Xva = self.standardizer(Xtr), self.standardizer(Xva) if len(Xva) else Xva

        variables = self._init()
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        steps_per_epoch = max(len(Xtr) // batch_size, 1)
        total_steps = steps_per_epoch * epochs
        sched = optax.cosine_onecycle_schedule(total_steps, peak_value=lr)  # fit_one_cycle
        opt = optax.adam(sched)
        opt_state = opt.init(params)

        model = self.model

        def one_step(params, batch_stats, opt_state, xb, yb):
            def loss_fn(p, bs):
                logits, updates = model.apply({"params": p, "batch_stats": bs}, xb, train=True,
                                              mutable=["batch_stats"])
                loss = optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()
                return loss, updates["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch_stats)
            updates, new_opt = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_bs, new_opt, loss

        step = jax.jit(one_step)

        @jax.jit
        def epoch_scan(params, batch_stats, opt_state, xs, ys):
            def body(carry, batch):
                p, bs, os_ = carry
                xb, yb = batch
                p, bs, os_, loss = one_step(p, bs, os_, xb, yb)
                return (p, bs, os_), loss

            (params, batch_stats, opt_state), losses = jax.lax.scan(
                body, (params, batch_stats, opt_state), (xs, ys))
            return params, batch_stats, opt_state, losses

        rng = np.random.default_rng(self.seed)
        history = []
        for epoch in range(epochs):
            order = rng.permutation(len(Xtr))[: steps_per_epoch * batch_size]
            if scan_epoch and len(order) >= steps_per_epoch * batch_size:
                idx = order.reshape(steps_per_epoch, batch_size)
                params, batch_stats, opt_state, losses = epoch_scan(
                    params, batch_stats, opt_state,
                    jnp.asarray(Xtr[idx]), jnp.asarray(ytr[idx]))
                losses = np.asarray(losses).tolist()
            else:
                losses = []
                for s in range(0, steps_per_epoch * batch_size, batch_size):
                    idx = order[s : s + batch_size]
                    if len(idx) < batch_size:
                        break
                    params, batch_stats, opt_state, loss = step(
                        params, batch_stats, opt_state, jnp.asarray(Xtr[idx]), jnp.asarray(ytr[idx])
                    )
                    losses.append(float(loss))
            rec = {"epoch": epoch + 1, "loss": float(np.mean(losses)) if losses else float("nan")}
            if len(Xva):
                acc = float((self._predict_logits(params, batch_stats, Xva).argmax(-1) == yva).mean())
                rec["valid_acc"] = acc
            history.append(rec)
            if verbose:
                print(rec)
        self.variables = {"params": params, "batch_stats": batch_stats}
        return {"history": history}

    def _predict_logits(self, params, batch_stats, X: np.ndarray, batch_size: int = 256) -> np.ndarray:
        # jit ONCE per instance and pad the tail chunk to a fixed shape: a
        # fresh jit per call (the old code) recompiled the forward every
        # validation epoch — ~30-60 s/epoch on CPU and a full remote compile
        # per epoch on relay-attached TPU — and every distinct tail length
        # would add one more compile
        if self._fwd is None:
            model = self.model
            self._fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        out = []
        for s in range(0, len(X), batch_size):
            xb = X[s : s + batch_size]
            n = len(xb)
            if n < batch_size:
                xb = np.concatenate(
                    [xb, np.zeros((batch_size - n, *xb.shape[1:]), xb.dtype)])
            logits = np.asarray(self._fwd({"params": params, "batch_stats": batch_stats},
                                          jnp.asarray(xb)))
            out.append(logits[:n])
        return np.concatenate(out) if out else np.zeros((0, 2), np.float32)

    def predict(self, X: np.ndarray) -> np.ndarray:
        """Class predictions for raw (N, T, C) windows (standardized internally)."""
        assert self.variables is not None, "train or load first"
        X = self.standardizer(np.asarray(X, np.float32))
        return self._predict_logits(self.variables["params"], self.variables["batch_stats"], X).argmax(-1)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        """(N, num_classes) softmax probabilities (standardized internally) —
        the score surface for window/video AUC (sklearn predict_proba parity)."""
        assert self.variables is not None, "train or load first"
        X = self.standardizer(np.asarray(X, np.float32))
        logits = self._predict_logits(self.variables["params"], self.variables["batch_stats"], X)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    def save(self, path: str) -> None:
        from cvsd_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(path, {
            "variables": self.variables,
            "standardizer": {"mean": self.standardizer.mean, "std": self.standardizer.std},
        }, config={"seq_len": self.seq_len, "num_channels": self.num_channels,
                   "num_classes": self.model.num_classes, "nf": self.model.nf})

    @classmethod
    def load(cls, path: str) -> "XceptionTimeClassifier":
        from cvsd_tpu.utils.checkpoint import load_checkpoint

        state, meta = load_checkpoint(path)
        cfg = meta.get("config") or {}
        obj = cls(seq_len=int(cfg.get("seq_len", 64)), num_channels=int(cfg.get("num_channels", 4)),
                  num_classes=int(cfg.get("num_classes", 2)), nf=int(cfg.get("nf", 16)))
        obj.variables = state["variables"]
        obj.standardizer.mean = np.asarray(state["standardizer"]["mean"])
        obj.standardizer.std = np.asarray(state["standardizer"]["std"])
        return obj
