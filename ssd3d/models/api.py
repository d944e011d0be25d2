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

        def infer(variables, points):
            if only_first:
                rpn_out = model.apply(
                    variables, points, False, 0.9, method="rpn"
                )
                boxes, scores, valid = rpn_spec.propose(rpn_out)
                import jax.numpy as jnp

                return {
                    "boxes": boxes,
                    "scores": scores,
                    "classes": jnp.zeros(scores.shape, jnp.int32),
                    "valid": valid,
                }
            out = model.apply(
                variables, points, False, 0.9, rpn_spec=rpn_spec
            )
            return rcnn_spec.final_detections(out)

        return Pipeline(cfg, model, graph, infer, rpn_spec.cls_list)

    from ssd3d.train.train_step import TrainGraph

    model, spec = build_detector(cfg)
    graph = TrainGraph.build(cfg, model, spec)

    def infer(variables, points):
        out = model.apply(variables, points, False)
        return spec.decode_and_nms(out)

    return Pipeline(cfg, model, graph, infer, spec.cls_list)
