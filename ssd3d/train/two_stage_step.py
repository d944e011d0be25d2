"""Two-stage (PointRCNN/STD) train step, one compiled program.

Mirrors the reference's DoubleStageDetector training flow
(double_stage_detector.py:166-295): RPN forward + stage-1 targets/losses,
in-graph proposal NMS, stage-2 IoU assignment on the proposals with the
pooler's context mask, static-size minibatch subsampling (the CUDA
GatherByMask becomes ops.gather_by_mask), RoI pooling + RCNN forward +
stage-2 losses. Stage-wise freezing (TRAIN_PARAM_PREFIX) and loss filtering
(TRAIN_LOSS_PREFIX: 'loss_stage0'/'loss_stage1') match the reference's
collection-scope semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ssd3d.core.geometry import boxes_bottom_to_center
from ssd3d.models.two_stage import expand_boxes
from ssd3d.ops.grouping import query_boxes_3d_mask
from ssd3d.ops.sampling import gather_by_mask
from ssd3d.train import losses as L
from ssd3d.train.assigner import AssignerConfig, assign_targets
from ssd3d.train.schedules import bn_momentum, learning_rate
from ssd3d.train.train_step import TrainState, make_optimizer

Array = jax.Array


def gather_tree_by_mask(tree: dict, mask: Array, k: int) -> dict:
    """Apply first-k mask gathering to every [bs, n, ...] tensor in a dict."""

    def one(x):
        if x is None:
            return None
        bs, n = x.shape[:2]
        flat = x.reshape(bs, n, -1)
        out = gather_by_mask(flat.astype(jnp.float32), mask, k)
        return out.reshape((bs, k) + x.shape[2:]).astype(x.dtype)

    return {key: one(v) for key, v in tree.items()}


@dataclasses.dataclass(frozen=True)
class TwoStageGraph:
    model: Any
    rpn_spec: Any
    rcnn_spec: Any
    loss_cfg_1: L.LossConfig
    loss_cfg_2: L.LossConfig
    assigner_1: AssignerConfig
    assigner_2: AssignerConfig
    solver_cfg: Any
    tx: Any
    only_first_stage: bool
    minibatch: int
    pool_context: float
    pool_mask_thresh: float
    loss_prefixes: tuple
    freeze_rpn: bool = False

    @classmethod
    def build(cls, cfg, model, rpn_spec, rcnn_spec):
        net1 = cfg.MODEL.NETWORK.FIRST_STAGE
        has_vote1 = any(
            l[11] == "Vote_Layer" for l in net1.ARCHITECTURE
        )
        return cls(
            model=model,
            rpn_spec=rpn_spec,
            rcnn_spec=rcnn_spec,
            loss_cfg_1=L.LossConfig.from_cfg(cfg, "FIRST_STAGE", vote=has_vote1),
            loss_cfg_2=L.LossConfig.from_cfg(cfg, "SECOND_STAGE"),
            assigner_1=AssignerConfig.from_cfg(cfg.MODEL.FIRST_STAGE),
            assigner_2=AssignerConfig.from_cfg(cfg.MODEL.SECOND_STAGE),
            solver_cfg=cfg.SOLVER,
            tx=make_optimizer(
                cfg.SOLVER, tuple(cfg.TRAIN.CONFIG.TRAIN_PARAM_PREFIX)
            ),
            only_first_stage=cfg.MODEL.ONLY_FIRST_STAGE,
            minibatch=cfg.MODEL.SECOND_STAGE.MINIBATCH_NUM,
            pool_context=net1.POINTS_POOLER[4],
            pool_mask_thresh=net1.POOLER_MASK_THRESHOLD,
            loss_prefixes=tuple(cfg.TRAIN.CONFIG.TRAIN_LOSS_PREFIX),
            # when stage-wise training freezes every rpn_* module, cutting the
            # gradient at the RPN outputs is equivalent and frees the whole
            # backbone backward graph (full-resolution FP activations OOM a
            # single chip otherwise)
            freeze_rpn=bool(cfg.TRAIN.CONFIG.TRAIN_PARAM_PREFIX)
            and not any(
                p.startswith("rpn") for p in cfg.TRAIN.CONFIG.TRAIN_PARAM_PREFIX
            ),
        )

    # ------------------------------------------------------------------
    def init_state(self, rng, example_points) -> TrainState:
        # initialize through a proposal-count-shrunken spec: parameter shapes
        # don't depend on the proposal count, and running the RCNN over the
        # full training proposal buffer (e.g. 1000) just to create params
        # wastes ~8 GB of activations
        init_spec = dataclasses.replace(
            self.rpn_spec,
            max_output=min(self.rpn_spec.max_output, max(self.minibatch, 8)),
        )
        variables = self.model.init(
            rng, example_points, False, 0.9, rpn_spec=init_spec
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
        )

    # ------------------------------------------------------------------
    def compute_losses(self, params, batch_stats, batch, rng, bn_m):
        variables = {"params": params, "batch_stats": batch_stats}
        rng1, rng2 = jax.random.split(rng)

        rpn_out, mutated = self.model.apply(
            variables, batch["points"], True, bn_m,
            method="rpn", mutable=["batch_stats"],
        )
        base_xyz = rpn_out["base_xyz"]
        anchors1 = self.rpn_spec.anchors(base_xyz)
        targets1 = assign_targets(
            self.assigner_1, rng1, base_xyz, anchors1,
            batch["gt_boxes"], batch["gt_labels"],
        )
        losses1 = L.compute_stage_losses(
            self.loss_cfg_1, self.rpn_spec.coder, rpn_out, targets1,
            anchors1, base_xyz, gt_boxes_scene=batch["gt_boxes"],
        )
        loss_dict = {f"loss_stage0/{k}": v for k, v in losses1.items()}

        if not self.only_first_stage:
            # in-graph proposal generation; stage-1 gradients flow only
            # through its own losses (proposals are treated as data)
            rpn_sg = {
                k: jax.lax.stop_gradient(v) if isinstance(v, jax.Array) else v
                for k, v in rpn_out.items()
            }
            proposals, _, prop_valid = self.rpn_spec.propose(rpn_sg)

            # stage-2 assignment on proposals, gated by the pooler context
            # mask (double_stage_detector.py:194-198)
            ctx_mask = query_boxes_3d_mask(
                jax.lax.stop_gradient(base_xyz),
                expand_boxes(proposals, self.pool_context),
            ).max(axis=-1)  # [bs, p]
            valid = (
                ctx_mask.astype(jnp.float32)
                * prop_valid.astype(jnp.float32)
            )[..., None]
            ctr = boxes_bottom_to_center(proposals)[..., 0:3]
            targets2 = assign_targets(
                self.assigner_2, rng2, ctr, proposals[:, :, None, :],
                batch["gt_boxes"], batch["gt_labels"], valid_mask=valid,
            )
            # static minibatch of proposals with any assignment
            # (Sampler.gather_list, sampler.py:20)
            sel_mask = jnp.max(
                targets2["pmask"] + targets2["nmask"], axis=-1
            ) > 0  # [bs, p]
            gathered = gather_tree_by_mask(
                {
                    "proposals": proposals,
                    "pmask": targets2["pmask"],
                    "nmask": targets2["nmask"],
                    "gt_cls": targets2["gt_cls"][..., None],
                    "gt_boxes": targets2["gt_boxes"],
                },
                sel_mask.astype(jnp.float32),
                self.minibatch,
            )
            sub_proposals = gathered["proposals"]
            targets2s = {
                "pmask": gathered["pmask"],
                "nmask": gathered["nmask"],
                "gt_cls": gathered["gt_cls"][..., 0].astype(jnp.int32),
                "gt_boxes": gathered["gt_boxes"],
            }

            base_mask = (
                jax.nn.sigmoid(jnp.max(rpn_sg["cls"], axis=-1, keepdims=True))
                >= self.pool_mask_thresh
            ).astype(jnp.float32)
            rcnn_feature = (
                rpn_sg["feature"] if self.freeze_rpn else rpn_out["feature"]
            )
            rcnn_out, mutated = self.model.apply(
                {"params": params, "batch_stats": mutated["batch_stats"]},
                rpn_sg["base_xyz"], rcnn_feature, base_mask,
                sub_proposals, True, bn_m,
                method="rcnn", mutable=["batch_stats"],
            )
            rcnn_out["proposals"] = sub_proposals
            sub_ctr = boxes_bottom_to_center(sub_proposals)[..., 0:3]
            losses2 = L.compute_stage_losses(
                self.loss_cfg_2, self.rcnn_spec.coder, rcnn_out, targets2s,
                sub_proposals[:, :, None, :], sub_ctr,
            )
            loss_dict.update({f"loss_stage1/{k}": v for k, v in losses2.items()})

        if self.loss_prefixes:
            trained = {
                k: v for k, v in loss_dict.items()
                if k.startswith(self.loss_prefixes)
            }
        else:
            trained = loss_dict
        total = sum(trained.values())
        return total, (loss_dict, mutated["batch_stats"])

    # ------------------------------------------------------------------
    def train_step(self, state: TrainState, batch: dict, rng: Array):
        bn_m = bn_momentum(self.solver_cfg, state.step)
        rng = jax.random.fold_in(rng, state.step)
        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            self.compute_losses, has_aux=True
        )(state.params, state.batch_stats, batch, rng, bn_m)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        )
        metrics = dict(loss_dict, total=total,
                       lr=learning_rate(self.solver_cfg, state.step))
        return new_state, metrics
