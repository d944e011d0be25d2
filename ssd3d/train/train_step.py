"""Single-stage train step: forward + assign + losses + update, one program.

Replaces the reference's multi-part step (per-GPU towers, host py_func target
assignment, CPU IoU op, gpu:0 gradient average — trainer.py:120-149) with ONE
jit-compiled function over a device mesh: the batch axis is sharded on
'data', parameters are replicated, and XLA GSPMD inserts the gradient
all-reduce over ICI. Batch-norm statistics are computed over the global batch
(= synchronized BN, the reference's SyncBN but free).

Gradient clipping matches the reference's global-norm 5.0 (trainer.py:144),
applied to the (already batch-averaged) gradient.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ssd3d.train import losses as L
from ssd3d.train.assigner import AssignerConfig, assign_targets, vote_targets
from ssd3d.train.schedules import bn_momentum, learning_rate

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(solver_cfg, train_param_prefix=()):
    """SGD+momentum or Adam, with piecewise-constant LR and global-norm clip.

    train_param_prefix: when non-empty, only parameters whose top-level module
    name starts with one of the prefixes receive updates — the reference's
    stage-wise freezing (TRAIN_PARAM_PREFIX, trainer_utils.py:56)."""
    lr = lambda step: learning_rate(solver_cfg, step)
    if solver_cfg.TYPE == "Adam":
        opt = optax.adam(lr)
    elif solver_cfg.TYPE == "SGD":
        opt = optax.sgd(lr, momentum=solver_cfg.MOMENTUM)
    elif solver_cfg.TYPE == "AdaBound":
        from ssd3d.train.adabound import adabound

        opt = adabound(lr)
    else:
        raise ValueError(f"unknown solver {solver_cfg.TYPE}")
    tx = optax.chain(optax.clip_by_global_norm(5.0), opt)
    if train_param_prefix:
        prefixes = tuple(train_param_prefix)

        def label_tree(params):
            def label_path(path):
                # path[0] is the top-level module name
                name = path[0].key if hasattr(path[0], "key") else str(path[0])
                return "train" if name.startswith(prefixes) else "freeze"

            return jax.tree_util.tree_map_with_path(
                lambda p, _: label_path(p), params
            )

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, label_tree
        )
    return tx


@dataclasses.dataclass(frozen=True)
class TrainGraph:
    """Everything static the train step needs."""

    model: Any  # SingleStageDetector module
    spec: Any  # DetectorSpec
    loss_cfg: L.LossConfig
    assigner_cfg: AssignerConfig
    solver_cfg: Any
    tx: Any
    aug_cfg: Any = None  # TRAIN.AUGMENTATIONS when TPU.DEVICE_AUGMENT is on
    # SUMMARY_HISTOGRAMS: the jsonl/scalar equivalent of the reference's TF
    # histogram summaries — global grad/param norms per summary window
    histograms: bool = False

    @classmethod
    def build(cls, cfg, model, spec):
        has_vote = any(
            l[11] == "Vote_Layer" for l in cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE
        )
        has_iou = any(h[5] == "IoU" for h in cfg.MODEL.NETWORK.FIRST_STAGE.HEAD)
        device_aug = (
            cfg.TPU.DEVICE_AUGMENT and cfg.TRAIN.AUGMENTATIONS.OPEN
        )
        return cls(
            model=model,
            spec=spec,
            loss_cfg=L.LossConfig.from_cfg(cfg, "FIRST_STAGE", vote=has_vote,
                                           iou=has_iou),
            assigner_cfg=AssignerConfig.from_cfg(cfg.MODEL.FIRST_STAGE),
            solver_cfg=cfg.SOLVER,
            tx=make_optimizer(cfg.SOLVER, tuple(cfg.TRAIN.CONFIG.TRAIN_PARAM_PREFIX)),
            aug_cfg=cfg.TRAIN.AUGMENTATIONS if device_aug else None,
            histograms=bool(cfg.TRAIN.CONFIG.SUMMARY_HISTOGRAMS),
        )

    # ------------------------------------------------------------------
    def init_state(self, rng, example_points) -> TrainState:
        variables = self.model.init(rng, example_points, False)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
        )

    # ------------------------------------------------------------------
    def compute_losses(self, params, batch_stats, batch, rng, bn_m):
        """batch: points [bs,n,3+c], gt_boxes [bs,g,7], gt_labels [bs,g]."""
        if self.aug_cfg is not None:
            from ssd3d.train.device_aug import augment_batch

            rng, rng_aug = jax.random.split(rng)
            batch = augment_batch(rng_aug, batch, self.aug_cfg)
        outputs, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["points"], True, bn_m, mutable=["batch_stats"],
        )
        base_xyz = outputs["base_xyz"]
        anchors = self.spec.anchors(base_xyz)

        targets = assign_targets(
            self.assigner_cfg, rng, base_xyz, anchors,
            batch["gt_boxes"], batch["gt_labels"],
            gt_velocity=batch.get("gt_velocity"),
            gt_attribute=batch.get("gt_attribute"),
        )
        loss_dict = L.compute_stage_losses(
            self.loss_cfg, self.spec.coder, outputs, targets, anchors,
            base_xyz, gt_boxes_scene=batch["gt_boxes"],
        )
        total = sum(loss_dict.values())
        return total, (loss_dict, mutated["batch_stats"])

    # ------------------------------------------------------------------
    def train_step(self, state: TrainState, batch: dict, rng: Array):
        """One optimizer step. Jit this with the batch sharded on 'data'."""
        bn_m = bn_momentum(self.solver_cfg, state.step)
        rng = jax.random.fold_in(rng, state.step)
        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            self.compute_losses, has_aux=True
        )(state.params, state.batch_stats, batch, rng, bn_m)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = dict(loss_dict, total=total,
                       lr=learning_rate(self.solver_cfg, state.step))
        if self.histograms:
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["param_norm"] = optax.global_norm(new_params)
        return new_state, metrics
