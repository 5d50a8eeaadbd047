"""Two-stage Shopformer trainer: jit-compiled train steps, stage freezing,
schedulers, early stopping, checkpoints, metrics, artifacts.

Capability parity with both reference training scripts:
- v1 (/root/reference/shopformer/train.py): stage-1 GCAE MSE loop with grad
  clipping (:189-236), stage-2 frozen-encoder transformer loop with
  PE-in-target loss (:239-297), per-epoch eval + best-AUC checkpointing
  (:583-613), EarlyStopping, config.json / training_history.json artifacts
  (:464-468, :634-636)
- v2 (/root/reference/shopformer_2/train.py): config-driven stages (:118-234,
  :266-429), gradient accumulation (:162-176), scheduler zoo (:48-113),
  stage{N}_{best,epoch,final} checkpoints, --stage/--checkpoint resume
  (:511-537), TensorBoard scalars + hparams (:188-190, :357-361, :564-579)

TPU-first: each stage is ONE jitted step function (augmentation fused in),
executed over a data-parallel mesh when provided — batches are sharded over
the 'data' axis, params replicated; XLA inserts the gradient psum. No
`.to(device)` per batch, no host sync inside the epoch loop except scalar
loss reads.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cvsd_tpu.config import Config, save_config, validate_config
from cvsd_tpu.data.augment import batched_augment_from_config
from cvsd_tpu.data.datamodule import PoseLiftDataModule
from cvsd_tpu.models.shopformer import Shopformer, build_shopformer, count_parameters
from cvsd_tpu.parallel.mesh import MeshConfig, batch_sharding, replicate
from cvsd_tpu.train.optim import (
    EarlyStopping,
    PlateauController,
    build_optimizer,
    current_learning_rate,
    set_learning_rate,
    stage_param_labels,
)
from cvsd_tpu.utils.checkpoint import CheckpointManager
from cvsd_tpu.utils.logging import ScalarLogger
from cvsd_tpu.utils.metrics import compute_metrics, compute_video_level_metrics


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


class Trainer:
    """Two-stage trainer. Usage: Trainer(config).setup().fit()"""

    def __init__(self, config: Dict[str, Any], mesh_config: Optional[MeshConfig] = None, verbose: bool = True):
        validate_config(config)
        self.config = Config(config)
        self.mesh_config = mesh_config
        self.verbose = verbose
        self.model: Optional[Shopformer] = None
        self.datamodule: Optional[PoseLiftDataModule] = None
        self.history: Dict[str, Any] = {"stage1": [], "stage2": []}
        self.best_auc = -1.0
        self.best_epoch = -1
        self._opts: Dict[int, Any] = {}
        self._fit_deadline: Optional[float] = None
        self.timed_out = False

    # -- setup ----------------------------------------------------------------

    def setup(self) -> "Trainer":
        cfg = self.config
        seed = int(cfg["experiment"].get("seed", 42))
        self.rng = jax.random.PRNGKey(seed)
        self.datamodule = PoseLiftDataModule(cfg, verbose=self.verbose).setup()
        self.model = build_shopformer(cfg)

        variables = self.model.init_variables(jax.random.PRNGKey(seed))
        self._params = variables["params"]
        self._batch_stats = variables.get("batch_stats", {})

        out_dir = cfg["experiment"].get("checkpoint_dir", "checkpoints")
        self.ckpt = CheckpointManager(out_dir, config=cfg.to_dict())
        self.logger = ScalarLogger(out_dir) if self.verbose else None
        save_config(cfg, os.path.join(out_dir, "config.json"))

        if self.verbose:
            counts = count_parameters(self._params)
            print(f"Model parameters: {counts}")
            print(f"Dataset stats: {self.datamodule.get_stats()}")
        self._build_steps()
        return self

    def _data_multiple(self) -> int:
        if self.mesh_config is None:
            return 1
        return int(self.mesh_config.mesh.shape[self.mesh_config.batch_axis])

    def _put_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        if self.mesh_config is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        mesh, axis = self.mesh_config.mesh, self.mesh_config.batch_axis
        return {
            k: jax.device_put(v, batch_sharding(mesh, np.asarray(v).ndim, axis)) for k, v in batch.items()
        }

    def _put_stacked(self, poses_all: np.ndarray, masks_all: np.ndarray, keys_all: jax.Array):
        """Stage a stacked epoch (leading steps axis) for the scan path: under
        a mesh the per-batch axis (dim 1) is sharded over 'data' so each
        scanned step runs data-parallel; keys replicate."""
        if self.mesh_config is None:
            return jnp.asarray(poses_all), jnp.asarray(masks_all), keys_all
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh, axis = self.mesh_config.mesh, self.mesh_config.batch_axis

        def put(x):
            x = np.asarray(x)
            return jax.device_put(x, NamedSharding(mesh, P(None, axis, *([None] * (x.ndim - 2)))))

        from cvsd_tpu.parallel.mesh import replicated_sharding

        return put(poses_all), put(masks_all), jax.device_put(keys_all, replicated_sharding(mesh))

    def _make_state(self, stage: int) -> TrainState:
        cfg = self.config
        epochs = int(cfg["training"][f"stage{stage}_epochs"])
        steps = max(
            self.datamodule.steps_per_epoch(self._data_multiple())
            // int(cfg["training"].get("grad_accum_steps", 1)),
            1,
        )
        labels = stage_param_labels(self._params, stage)
        self._opts[stage] = build_optimizer(cfg, steps, epochs, param_labels=labels)
        opt_state = self._opts[stage].init(self._params)
        state = TrainState(
            params=self._params, batch_stats=self._batch_stats,
            opt_state=opt_state, step=jnp.asarray(0, jnp.int32),
        )
        if self.mesh_config is not None:
            state = replicate(self.mesh_config.mesh, state)
        return state

    def _build_steps(self) -> None:
        model = self.model
        cfg_dict = self.config.to_dict()
        augment_on = bool(self.config["data"].get("augment", {}).get("enabled", True))
        remat = bool(self.config["training"].get("remat", False))

        def maybe_augment(key, poses):
            if not augment_on:
                return poses
            return batched_augment_from_config(key, poses, cfg_dict)

        def loss_fn(params, batch_stats, poses, mask, key, stage, train):
            variables = {"params": params, "batch_stats": batch_stats}
            akey, dkey = jax.random.split(key)
            if train:
                poses = maybe_augment(akey, poses)
            method = "compute_gcae_loss" if stage == 1 else "compute_transformer_loss"
            if train and stage == 1:
                # stage 1 updates BatchNorm running stats
                def fwd(variables, poses):
                    return model.apply(
                        variables, poses, train=True, mask=mask, method=method,
                        mutable=["batch_stats"], rngs={"dropout": dkey},
                    )

                if remat:
                    # rematerialize activations in the backward pass
                    # (jax.checkpoint: trade FLOPs for HBM)
                    fwd = jax.checkpoint(fwd)
                loss, updates = fwd(variables, poses)
                return loss, updates["batch_stats"]
            fwd = lambda variables, poses: model.apply(  # noqa: E731
                variables, poses, train=train, mask=mask, method=method,
                rngs={"dropout": dkey} if train else None,
            )
            if remat and train:
                fwd = jax.checkpoint(fwd)
            loss = fwd(variables, poses)
            return loss, batch_stats

        def train_step(stage):
            def step(state: TrainState, poses, mask, key):
                (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state.batch_stats, poses, mask, key, stage, True
                )
                # per-stage optimizer: created by _make_state(stage) before the
                # first trace of this step, so the closure binds the right one
                updates, new_opt = self._opts[stage].update(grads, state.opt_state, state.params)
                new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
                return (
                    state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt, step=state.step + 1),
                    loss,
                )

            return step

        self._stage_steps = {1: jax.jit(train_step(1), donate_argnums=0), 2: jax.jit(train_step(2), donate_argnums=0)}

        def epoch_scan(stage):
            # one dispatch per EPOCH: scan the per-batch step over stacked
            # batches — same math as the per-batch path (sequential updates),
            # but only one host->device round trip per epoch. Critical on
            # remote-relay TPU setups where per-dispatch latency dominates
            # tiny-model steps.
            step = train_step(stage)

            def run(state: TrainState, poses_all, masks_all, keys_all):
                def body(s, batch):
                    poses, mask, key = batch
                    return step(s, poses, mask, key)

                return jax.lax.scan(body, state, (poses_all, masks_all, keys_all))

            return run

        self._stage_epoch_scans = {1: jax.jit(epoch_scan(1), donate_argnums=0),
                                   2: jax.jit(epoch_scan(2), donate_argnums=0)}

        def eval_step(params, batch_stats, poses):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, poses, method="compute_anomaly_score"
            )

        self._eval_step = jax.jit(eval_step)

    # -- stages --------------------------------------------------------------

    def train_stage(self, stage: int, state: Optional[TrainState] = None) -> TrainState:
        cfg = self.config
        t = cfg["training"]
        epochs = int(t[f"stage{stage}_epochs"])
        if state is None:
            state = self._make_state(stage)
        step_fn = self._stage_steps[stage]
        early = None
        es_cfg = t.get("early_stopping", {})
        if stage == 2 and es_cfg.get("enabled", True):
            early = EarlyStopping(
                patience=int(es_cfg.get("patience", 20)),
                min_delta=float(es_cfg.get("min_delta", 0.0)),
                mode=es_cfg.get("mode", "max"),
            )
        plateau = None
        if t.get("scheduler") == "reduce_on_plateau":
            sp = t.get("scheduler_params", {})
            plateau = PlateauController(
                factor=float(sp.get("plateau_factor", 0.5)),
                patience=int(sp.get("plateau_patience", 5)),
                mode="min" if stage == 1 else "max",
            )

        # wall-clock budget (training.max_seconds, 0 = unlimited) checked
        # between epochs — the in-process analog of the reference sweep's
        # 2 h per-config subprocess timeout (reference sweep.py:189-195);
        # fit() arms one shared deadline spanning both stages
        max_seconds = float(t.get("max_seconds", 0) or 0)
        if max_seconds > 0 and getattr(self, "_fit_deadline", None) is None:
            self._fit_deadline = time.perf_counter() + max_seconds
        deadline = getattr(self, "_fit_deadline", None)

        mult = self._data_multiple()
        ckpt_every = int(t.get("checkpoint_every_n_epochs", 0) or 0)
        eval_every = int(t.get("eval_every_n_epochs", 1) or 1)
        best_loss = float("inf")
        epoch_loss = float("nan")  # stays NaN when epochs == 0

        scan_epoch = bool(t.get("scan_epoch", False))
        # chunk the epoch scan to bound host-side stacking memory (0 = whole epoch)
        scan_chunk = int(t.get("scan_epoch_chunk", 0) or 0)
        for epoch in range(1, epochs + 1):
            t0 = time.perf_counter()
            losses = []
            if scan_epoch:
                batches = list(self.datamodule.train_batches(epoch=epoch, pad_to_multiple_of=mult))
                if batches:
                    chunk = scan_chunk if scan_chunk > 0 else len(batches)
                    for c0 in range(0, len(batches), chunk):
                        part = batches[c0 : c0 + chunk]
                        poses_all = np.stack([b["poses"] for b in part])
                        masks_all = np.stack([b["mask"] for b in part])
                        keys_all = jnp.stack([
                            jax.random.fold_in(self.rng, epoch * 100003 + c0 + i)
                            for i in range(len(part))
                        ])
                        poses_all, masks_all, keys_all = self._put_stacked(
                            poses_all, masks_all, keys_all
                        )
                        state, loss_arr = self._stage_epoch_scans[stage](
                            state, poses_all, masks_all, keys_all
                        )
                        losses.append(np.asarray(jax.device_get(loss_arr)))
                    epoch_loss = float(np.mean(np.concatenate(losses)))
                else:
                    epoch_loss = float("nan")
            else:
                for i, batch in enumerate(self.datamodule.train_batches(epoch=epoch, pad_to_multiple_of=mult)):
                    # key from host-side counters only (same formula as the
                    # scan path): deriving it from state.step would force a
                    # host-device sync per step and serialize dispatch
                    key = jax.random.fold_in(self.rng, epoch * 100003 + i)
                    b = self._put_batch(batch)
                    state, loss = step_fn(state, b["poses"], b["mask"], key)
                    losses.append(loss)
                epoch_loss = float(np.mean([jax.device_get(l) for l in losses])) if losses else float("nan")
            if losses and not np.isfinite(epoch_loss) and t.get("abort_on_nan", True):
                # failure detection: a NaN/inf loss means diverged training —
                # stop the stage instead of burning the remaining epochs
                # (SURVEY.md §5.3: the reference has no such guard)
                self.history[f"stage{stage}"].append({"epoch": epoch, "loss": epoch_loss, "aborted": "non-finite loss"})
                if self.verbose:
                    print(f"[stage{stage}] ABORT at epoch {epoch}: non-finite loss {epoch_loss}")
                break
            lr = current_learning_rate(state.opt_state)
            dt = time.perf_counter() - t0

            record: Dict[str, Any] = {"epoch": epoch, "loss": epoch_loss, "lr": lr, "seconds": dt}
            if self.logger:
                self.logger.log_scalar(f"Stage{stage}/Loss", epoch_loss, epoch)
                if lr is not None:
                    self.logger.log_scalar(f"Stage{stage}/LR", lr, epoch)

            if stage == 2 and (epoch % eval_every == 0):
                labels, scores, _ = self.score_test_set(state)
                m = compute_metrics(labels, scores)
                record.update({"auc_roc": m["auc_roc"], "auc_pr": m["auc_pr"]})
                if self.logger:
                    self.logger.log_scalar("Stage2/AUC_ROC", m["auc_roc"], epoch)
                    self.logger.log_scalar("Stage2/AUC_PR", m["auc_pr"], epoch)
                if m["auc_roc"] > self.best_auc:
                    self.best_auc = m["auc_roc"]
                    self.best_epoch = epoch
                    self.ckpt.save_best(2, self._ckpt_state(state), epoch=epoch, metrics=m,
                                        history=self.history)
                if plateau is not None and lr is not None:
                    new_lr = plateau.update(m["auc_roc"], lr)
                    if new_lr != lr:
                        state = state.replace(opt_state=set_learning_rate(state.opt_state, new_lr))
                if early is not None and early(m["auc_roc"]):
                    self.history[f"stage{stage}"].append(record)
                    if self.verbose:
                        print(f"[stage2] early stop at epoch {epoch} (best AUC {self.best_auc:.4f})")
                    break
            elif stage == 1:
                if plateau is not None and lr is not None:
                    new_lr = plateau.update(epoch_loss, lr)
                    if new_lr != lr:
                        state = state.replace(opt_state=set_learning_rate(state.opt_state, new_lr))
                if epoch_loss < best_loss:
                    best_loss = epoch_loss
                    self.ckpt.save_best(1, self._ckpt_state(state), epoch=epoch,
                                        metrics={"loss": epoch_loss}, history=self.history)

            self.history[f"stage{stage}"].append(record)
            if ckpt_every and epoch % ckpt_every == 0:
                self.ckpt.save_epoch(stage, epoch, self._ckpt_state(state))
            if self.verbose:
                msg = f"[stage{stage}] epoch {epoch}/{epochs} loss={epoch_loss:.6f}"
                if "auc_roc" in record:
                    msg += f" auc={record['auc_roc']:.4f}"
                print(msg + f" ({dt:.1f}s)")
            if deadline is not None and time.perf_counter() > deadline:
                record["aborted"] = "max_seconds exceeded"
                self.timed_out = True
                if self.verbose:
                    print(f"[stage{stage}] ABORT at epoch {epoch}: "
                          f"training.max_seconds budget exceeded")
                break

        self.ckpt.save_final(stage, self._ckpt_state(state), metrics={"loss": epoch_loss},
                             history=self.history)
        # propagate trained params/stats to the next stage
        self._params = jax.device_get(state.params)
        self._batch_stats = jax.device_get(state.batch_stats)
        return state

    def _ckpt_state(self, state: TrainState) -> Dict[str, Any]:
        return {"params": jax.device_get(state.params), "batch_stats": jax.device_get(state.batch_stats)}

    # -- eval ----------------------------------------------------------------

    def score_test_set(self, state: Optional[TrainState] = None) -> Tuple[np.ndarray, np.ndarray, list]:
        """Returns (labels, scores, video_ids) over the test split, batched."""
        params = state.params if state is not None else self._params
        bs = state.batch_stats if state is not None else self._batch_stats
        mult = self._data_multiple()
        all_scores, all_labels = [], []
        for batch in self.datamodule.test_batches(pad_to_multiple_of=mult):
            b = self._put_batch(batch)
            s = np.asarray(jax.device_get(self._eval_step(params, bs, b["poses"])))
            m = batch["mask"].astype(bool)
            all_scores.append(s[m])
            all_labels.append(batch["labels"][m])
        scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
        labels = np.concatenate(all_labels) if all_labels else np.zeros(0)
        video_ids = list(self.datamodule.test_dataset.video_ids)[: len(scores)]
        return labels, scores, video_ids

    def evaluate(self, state: Optional[TrainState] = None) -> Dict[str, Any]:
        labels, scores, video_ids = self.score_test_set(state)
        ev = self.config.get("eval", {})
        metrics = compute_metrics(labels, scores, threshold=ev.get("threshold"),
                                  threshold_method=ev.get("threshold_method", "youden"))
        result: Dict[str, Any] = {"frame_level": metrics}
        aggs = ev.get("video_aggregations")
        if aggs and len(video_ids) == len(scores):
            result["video_level"] = compute_video_level_metrics(labels, scores, video_ids, aggs)
        result["score_stats"] = {
            "mean": float(scores.mean()) if scores.size else 0.0,
            "std": float(scores.std()) if scores.size else 0.0,
            "min": float(scores.min()) if scores.size else 0.0,
            "max": float(scores.max()) if scores.size else 0.0,
            "median": float(np.median(scores)) if scores.size else 0.0,
        }
        return result

    # -- orchestration ----------------------------------------------------------

    def fit(self, start_stage: int = 1, resume_checkpoint: Optional[str] = None) -> Dict[str, Any]:
        """Run both stages; supports --stage/--checkpoint resume semantics
        (reference: shopformer_2/train.py:511-537)."""
        max_s = float(self.config["training"].get("max_seconds", 0) or 0)
        if max_s > 0 and self._fit_deadline is None:
            # one budget for the WHOLE fit (both stages), armed here so a
            # slow stage 1 can't hand stage 2 a fresh clock
            self._fit_deadline = time.perf_counter() + max_s
        if resume_checkpoint:
            self.load_model_state(resume_checkpoint)
        elif start_stage == 2 and self.ckpt.exists("stage1_best"):
            # jumping to stage 2 auto-loads stage1_best
            self.load_model_state(self.ckpt.path("stage1_best"))

        if start_stage <= 1:
            self.train_stage(1)
        state2 = self.train_stage(2)

        # final: prefer best stage-2 checkpoint
        if self.ckpt.exists("stage2_best"):
            self.load_model_state(self.ckpt.path("stage2_best"))
        results = self.evaluate()
        artifact = {
            "config": self.config.to_dict(),
            "history": self.history,
            "timed_out": self.timed_out,
            "best_auc": self.best_auc,
            "best_epoch": self.best_epoch,
            "test_metrics": results["frame_level"],
            "video_metrics": results.get("video_level"),
            "score_stats": results["score_stats"],
        }
        out_dir = self.config["experiment"].get("checkpoint_dir", "checkpoints")
        with open(os.path.join(out_dir, "training_history.json"), "w") as f:
            json.dump(self.history, f, indent=2, default=float)
        with open(os.path.join(out_dir, "training_results.json"), "w") as f:
            json.dump(artifact, f, indent=2, default=float)
        if self.logger:
            flat_hp = {
                "lr": self.config["training"]["lr"],
                "optimizer": self.config["training"]["optimizer"],
                "variant": self.config["model"]["variant"],
                "num_tokens": self.config["model"]["num_tokens"],
            }
            self.logger.log_hparams(flat_hp, results["frame_level"])
        if self.verbose:
            print(f"Final test metrics: {results['frame_level']}")
        return artifact

    def load_model_state(self, path: str) -> None:
        from cvsd_tpu.utils.checkpoint import load_checkpoint

        target = {"params": self._params, "batch_stats": self._batch_stats}
        state, _meta = load_checkpoint(path, target_state=target)
        self._params = state["params"]
        self._batch_stats = state["batch_stats"]


def train_from_config(config: Dict[str, Any], mesh_config: Optional[MeshConfig] = None,
                      verbose: bool = True, start_stage: int = 1,
                      resume_checkpoint: Optional[str] = None) -> Dict[str, Any]:
    return Trainer(config, mesh_config, verbose=verbose).setup().fit(
        start_stage=start_stage, resume_checkpoint=resume_checkpoint
    )
