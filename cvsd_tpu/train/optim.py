"""Optimizers, LR schedules, gradient accumulation, freezing, early stopping.

Capability parity with the reference training machinery:
- get_optimizer: Adam vs AdamW switch (shopformer_2/train.py:35-46)
- get_scheduler: constant / cosine_warmup (linear warmup) / step /
  exponential (per-step gamma derived from per-epoch gamma) /
  reduce_on_plateau — all gradient-accumulation-aware
  (shopformer_2/train.py:48-113)
- gradient accumulation (shopformer_2/train.py:162-176) -> optax.MultiSteps
- grad clipping (clip_by_global_norm)
- stage freezing (v1 shopformer.py:114-123; v2 :73-92) -> optax.multi_transform
  masking the frozen top-level param subtree with set_to_zero
- EarlyStopping (shopformer/train.py:36-65)

The learning rate is exposed through optax.inject_hyperparams so
reduce-on-plateau (a host-side decision) can mutate it between epochs without
recompiling the jitted step.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import optax


def build_schedule(
    name: str,
    base_lr: float,
    steps_per_epoch: int,
    num_epochs: int,
    params: Optional[Dict[str, Any]] = None,
) -> Union[float, Callable[[int], float]]:
    """LR schedule over OPTIMIZER steps (already divided by grad-accum).
    reduce_on_plateau returns the constant base lr — the plateau logic lives in
    PlateauController and mutates the injected hyperparameter."""
    p = params or {}
    total_steps = max(steps_per_epoch * num_epochs, 1)
    if name in ("constant", "none", "reduce_on_plateau"):
        return base_lr
    if name == "cosine_warmup":
        warmup_steps = max(int(p.get("warmup_epochs", 1)) * steps_per_epoch, 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr,
            warmup_steps=warmup_steps, decay_steps=max(total_steps, warmup_steps + 1),
        )
    if name == "step":
        step_size = int(p.get("step_size", 10)) * steps_per_epoch
        gamma = float(p.get("gamma", 0.1))

        def sched(count):
            return base_lr * gamma ** (count // max(step_size, 1))

        return sched
    if name == "exponential":
        # per-step gamma derived from per-epoch gamma (shopformer_2/train.py:94-104)
        gamma_epoch = float(p.get("gamma", 0.95))
        gamma_step = gamma_epoch ** (1.0 / max(steps_per_epoch, 1))
        return lambda count: base_lr * gamma_step**count
    if name in ("cosine_warm_restarts", "cosine_restarts"):
        # CosineAnnealingWarmRestarts semantics (restarting cosine cycles of
        # length T_0 * T_mult^k epochs; reference shopformer/train.py:484-531
        # uses T_0 = max(1, stage_epochs // 3), T_mult=2, eta_min=min_lr)
        t0 = float(p.get("T_0", max(num_epochs // 3, 1))) * max(steps_per_epoch, 1)
        t_mult = float(p.get("T_mult", 2.0))
        eta_min = float(p.get("eta_min", p.get("min_lr", 0.0)))

        def restarts(count):
            t = jnp.asarray(count, jnp.float32)
            if t_mult == 1.0:
                t_cur = jnp.mod(t, t0)
                t_i = t0
            else:
                n = jnp.floor(
                    jnp.log(jnp.maximum(t / t0 * (t_mult - 1.0) + 1.0, 1.0)) / math.log(t_mult)
                )
                t_cur = t - t0 * (t_mult**n - 1.0) / (t_mult - 1.0)
                t_i = t0 * t_mult**n
            return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))

        return restarts
    raise ValueError(f"unknown scheduler {name!r}")


def build_optimizer(
    config: Dict[str, Any],
    steps_per_epoch: int,
    num_epochs: int,
    trainable_labels: Optional[Dict[str, str]] = None,
    param_labels: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Full optimizer chain: clip -> (masked) adam/adamw(lr schedule) -> accum.

    `param_labels`: a pytree (or prefix dict) of 'train'/'freeze' labels; when
    given, frozen leaves get set_to_zero (functional equivalent of the
    reference's requires_grad_(False) freezing).
    """
    t = config["training"]
    name = t.get("optimizer", "adam").lower()
    lr = build_schedule(
        t.get("scheduler", "constant"), float(t.get("lr", 5e-5)),
        steps_per_epoch, num_epochs, t.get("scheduler_params"),
    )
    wd = float(t.get("weight_decay", 0.0))

    def make(learning_rate):
        if name == "adamw":
            return optax.adamw(learning_rate, weight_decay=wd)
        if name == "adam":
            return optax.adam(learning_rate)
        raise ValueError(f"unknown optimizer {name!r}")

    base = optax.inject_hyperparams(make)(learning_rate=lr)

    if param_labels is not None:
        base = optax.multi_transform({"train": base, "freeze": optax.set_to_zero()}, param_labels)

    chain = [base]
    clip = float(t.get("grad_clip", 0.0) or 0.0)
    if clip > 0:
        chain = [optax.clip_by_global_norm(clip), base]
    opt = optax.chain(*chain)

    accum = int(t.get("grad_accum_steps", 1))
    if accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum)
    return opt


def stage_param_labels(params: Any, stage: int) -> Any:
    """Label top-level param subtrees for the two-stage regime: stage 1 trains
    the GCAE, stage 2 freezes it and trains the transformer
    (reference: shopformer/train.py:253-254, :539-545; shopformer_2/train.py:285)."""
    train_key = "gcae" if stage == 1 else "transformer"
    return {k: ("train" if k == train_key else "freeze") for k in params.keys()}


def current_learning_rate(opt_state: Any) -> Optional[float]:
    """Dig the injected learning_rate out of a (possibly wrapped) opt state."""
    found = []

    def visit(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            found.append(float(jax.device_get(hp["learning_rate"])))
            return
        inner = getattr(s, "inner_state", None)
        if inner is not None:
            visit(inner)
            return
        if isinstance(s, (tuple, list)):
            for item in s:
                visit(item)
        elif isinstance(s, dict):
            for item in s.values():
                visit(item)

    visit(opt_state)
    return found[0] if found else None


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Return a copy of opt_state with every injected learning_rate replaced —
    the host side of reduce-on-plateau."""

    def rewrite(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            new_hp = dict(hp)
            new_hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return s._replace(hyperparams=new_hp)
        inner = getattr(s, "inner_state", None)
        if inner is not None and hasattr(s, "_replace"):
            return s._replace(inner_state=rewrite(inner))
        if isinstance(s, tuple) and not hasattr(s, "_replace"):
            return tuple(rewrite(item) for item in s)
        if hasattr(s, "_replace"):  # other namedtuples: rewrite fields
            fields = {f: rewrite(getattr(s, f)) for f in s._fields}
            return s._replace(**fields)
        if isinstance(s, dict):
            return {k: rewrite(v) for k, v in s.items()}
        return s

    return rewrite(opt_state)


class PlateauController:
    """reduce_on_plateau: scale lr by `factor` after `patience` epochs without
    improvement (reference: shopformer_2/train.py:106-113)."""

    def __init__(self, factor: float = 0.5, patience: int = 5, mode: str = "min", min_lr: float = 1e-8):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.min_lr = min_lr
        self.best = math.inf if mode == "min" else -math.inf
        self.bad_epochs = 0

    def update(self, metric: float, lr: float) -> float:
        improved = metric < self.best if self.mode == "min" else metric > self.best
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.bad_epochs = 0
                return max(lr * self.factor, self.min_lr)
        return lr


class EarlyStopping:
    """Patience/min_delta/mode early stopping (reference: shopformer/train.py:36-65)."""

    def __init__(self, patience: int = 20, min_delta: float = 0.0, mode: str = "max"):
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def __call__(self, metric: float) -> bool:
        if self.best is None:
            self.best = metric
            return False
        improved = (
            metric > self.best + self.min_delta if self.mode == "max" else metric < self.best - self.min_delta
        )
        if improved:
            self.best = metric
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop
