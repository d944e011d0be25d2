"""Unified model construction + inference dispatch (the reference's
modeling/__init__.py choose_model, config-driven by MODEL.TYPE)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax

from ssd3d.models.single_stage import build_detector
from ssd3d.models.two_stage import build_two_stage


@dataclasses.dataclass(frozen=True)
class Pipeline:
    """Everything the runtimes need: the module, a train graph factory, and a
    jittable inference function (variables, points) -> detection dict."""

    cfg: Any
    model: Any
    graph: Any
    infer: Callable
    cls_list: tuple

    def init_variables(self, rng, example_points):
        state = self.graph.init_state(rng, example_points)
        return state


def build_pipeline(cfg, nms_pre_topk: int = 2048) -> Pipeline:
    if cfg.MODEL.TYPE == "DoubleStage":
        from ssd3d.train.two_stage_step import TwoStageGraph

        model, rpn_spec, rcnn_spec = build_two_stage(
            cfg, nms_pre_topk=nms_pre_topk
        )
        graph = TwoStageGraph.build(cfg, model, rpn_spec, rcnn_spec)
        only_first = cfg.MODEL.ONLY_FIRST_STAGE
        chunk_limit = cfg.TEST.RCNN_INFER_CHUNK

        def infer(variables, points):
            import jax.numpy as jnp

            if only_first:
                rpn_out = model.apply(
                    variables, points, False, 0.9, method="rpn"
                )
                boxes, scores, valid = rpn_spec.propose(rpn_out)
                return {
                    "boxes": boxes,
                    "scores": scores,
                    "classes": jnp.zeros(scores.shape, jnp.int32),
                    "valid": valid,
                }
            # Decomposed test-mode forward (same semantics as
            # TwoStageDetector.__call__) so the RCNN can run over proposal
            # chunks: refining all MAX_OUTPUT_NUM proposals at once
            # materializes the pooled neighbour gather for every proposal
            # simultaneously, which exceeds single-chip HBM at the shipped
            # 1000-proposal setting (two ~11.7 GiB buffers measured).
            rpn_out = model.apply(variables, points, False, 0.9, method="rpn")
            proposals, scores, valid = rpn_spec.propose(rpn_out)
            base_mask = (
                jax.nn.sigmoid(jnp.max(rpn_out["cls"], axis=-1, keepdims=True))
                >= 0.5
            ).astype(jnp.float32)

            def run_rcnn(prop):
                return model.apply(
                    variables, rpn_out["base_xyz"], rpn_out["feature"],
                    base_mask, prop, False, 0.9, method="rcnn",
                )

            p = proposals.shape[1]
            chunk = max(
                (d for d in range(1, min(chunk_limit, p) + 1) if p % d == 0),
                default=p,
            ) if chunk_limit else p
            if chunk < p:
                n = p // chunk
                stacked = proposals.reshape(
                    proposals.shape[0], n, chunk, proposals.shape[-1]
                ).transpose(1, 0, 2, 3)  # [n, bs, chunk, 7]
                mapped = jax.lax.map(run_rcnn, stacked)
                out = jax.tree.map(
                    lambda x: jnp.moveaxis(x, 0, 1).reshape(
                        x.shape[1], n * x.shape[2], *x.shape[3:]
                    ),
                    mapped,
                )
            else:
                out = run_rcnn(proposals)
            out["proposals"] = proposals
            out["proposal_scores"] = scores
            out["proposal_valid"] = valid
            dets = rcnn_spec.final_detections(out)
            # stage-1 proposals ride along so the evaluator can report
            # proposal recall — the quantity refinement cannot recover
            # (reference TEST_MODE 'Recall', kitti_dataloader.py:385-408)
            dets["proposals"] = proposals
            dets["proposals_valid"] = valid
            return dets

        return Pipeline(cfg, model, graph, infer, rpn_spec.cls_list)

    from ssd3d.train.train_step import TrainGraph

    model, spec = build_detector(cfg)
    graph = TrainGraph.build(cfg, model, spec)

    def infer(variables, points):
        out = model.apply(variables, points, False)
        return spec.decode_and_nms(out)

    return Pipeline(cfg, model, graph, infer, spec.cls_list)
