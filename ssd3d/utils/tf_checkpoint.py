"""Reference TF-1 checkpoint -> ssd3d parameter tree converter.

The reference stores weights as TF1 variables named by nested variable scopes
(created in lib/utils/tf_util.py): `<layer_scope>/conv<i>_<j>/weights`,
`.../biases`, and contrib BatchNorm stats under `.../bn/{gamma, beta,
moving_mean, moving_variance}`. This maps them onto our flax tree so a
reference-trained model runs through this framework (the SURVEY parity
requirement: "checkpoint-convertible weights").

Name-mapping rules (derived from the graph builders, not hand-listed):
    SA MLP       flax backbone/<scope>/mlp<i>/conv<j>   <- <scope>/conv<i>_<j>
    aggregation  flax backbone/<scope>/aggregation      <- <scope>/ensemble
    vote layer   flax backbone/<scope>/mlp/conv<i>      <- <scope>/vote_layer_<i>
                 flax backbone/<scope>/vote_offsets     <- <scope>/vote_offsets
    FP module    flax backbone/<scope>/mlp/conv<i>      <- <scope>/conv_<i>
    SSG-last     flax backbone/<scope>/mlp/conv<j>      <- <scope>/conv<j>
    heads        flax <head>/trunk/conv<i>              <- <scope>/conv1d_<i>
                 flax <head>/pred_*                     <- <scope>/pred_*
    params       kernel <- weights (squeezed to [in, out]), bias <- biases
                 bn/scale <- bn/gamma, bn/bias <- bn/beta
    batch_stats  bn/mean <- bn/moving_mean, bn/var <- bn/moving_variance

Duplicate-scope handling mirrors the backbone's name deduplication: when a
YAML reuses a scope (legal in TF; e.g. 3dssd.yaml names two layers "vote"),
the flax module is `<scope>_<layer_idx>` while the TF variables live under
the raw scope (only one of the duplicates creates variables).
"""

from __future__ import annotations

import numpy as np


def _used_names(architecture):
    """Replay PointBackbone's scope deduplication: layer index -> flax name."""
    used = set()
    names = []
    for layer_i, spec in enumerate(architecture):
        scope = spec[12]
        name = scope if scope and scope not in used else f"{scope or 'layer'}_{layer_i}"
        used.add(name)
        names.append(name)
    return names


def build_name_map(cfg, stage: str = "FIRST_STAGE", backbone: str = "backbone",
                   head_prefix: str = "head"):
    """-> (param_map, stats_map): flax path tuple -> TF variable name prefix.

    Paths are relative to the variables root, e.g.
    ('params', 'backbone', 'layer1', 'mlp0', 'conv0')."""
    net_cfg = cfg.MODEL.NETWORK[stage]
    arch = net_cfg.ARCHITECTURE
    flax_names = _used_names(arch)
    conv_map: dict = {}

    for layer_i, spec in enumerate(arch):
        layer_type, scope = spec[11], spec[12]
        flax_name = flax_names[layer_i]
        if layer_type == "SA_Layer":
            radius_list, mlp_list = spec[2], spec[4]
            if not isinstance(radius_list, (list, tuple)) or not radius_list:
                continue  # gather-only layer: no variables
            for i, mlps in enumerate(mlp_list):
                for j in range(len(mlps)):
                    conv_map[(backbone, flax_name, f"mlp{i}", f"conv{j}")] = (
                        f"{scope}/conv{i}_{j}"
                    )
            if spec[15] != -1 and cfg.MODEL.NETWORK.AGGREGATION_SA_FEATURE:
                conv_map[(backbone, flax_name, "aggregation")] = f"{scope}/ensemble"
        elif layer_type == "Vote_Layer":
            for i in range(len(spec[4])):
                conv_map[(backbone, flax_name, "mlp", f"conv{i}")] = (
                    f"{scope}/vote_layer_{i}"
                )
            conv_map[(backbone, flax_name, "vote_offsets")] = f"{scope}/vote_offsets"
        elif layer_type == "FP_Layer":
            for i in range(len(spec[4])):
                conv_map[(backbone, flax_name, "mlp", f"conv{i}")] = (
                    f"{scope}/conv_{i}"
                )
        elif layer_type == "SA_Layer_SSG_Last":
            for j in range(len(spec[4])):
                conv_map[(backbone, flax_name, "mlp", f"conv{j}")] = (
                    f"{scope}/conv{j}"
                )

    for i, head in enumerate(net_cfg.HEAD):
        mlp, head_type, scope = head[3], head[5], head[6]
        flax_head = scope if scope else f"{head_prefix}{i}"

        def tf_name(sub, scope=scope):
            # an empty TF variable scope adds no prefix
            return f"{scope}/{sub}" if scope else sub

        for j in range(len(mlp)):
            conv_map[(flax_head, "trunk", f"conv{j}")] = tf_name(f"conv1d_{j}")
        if head_type == "Det":
            for sub in ("pred_cls_base", "pred_cls", "pred_reg_base", "pred_reg",
                        "pred_attr_base", "pred_attr", "pred_velo_base",
                        "pred_velo"):
                conv_map[(flax_head, sub)] = tf_name(sub)
        else:
            for sub in ("pred_iou_base", "pred_iou"):
                conv_map[(flax_head, sub)] = tf_name(sub)
    return conv_map


def build_two_stage_name_map(cfg):
    """Name map for the DoubleStage (PointRCNN/STD) model: both backbones
    under their flax module names, the RoI pooler's align/vfe MLPs
    (reference pool_utils.py:5 scoping — `<pool_scope>/conv%d` and
    `<pool_scope>/vfe/conv%d`, points_pooler.py:101-114), and both head
    stacks."""
    conv_map = build_name_map(
        cfg, "FIRST_STAGE", backbone="rpn_backbone", head_prefix="rpn_head"
    )
    conv_map.update(build_name_map(
        cfg, "SECOND_STAGE", backbone="rcnn_backbone", head_prefix="rcnn_head"
    ))
    pc = cfg.MODEL.NETWORK.FIRST_STAGE.POINTS_POOLER
    pool_type, align_channels, scope = pc[0], pc[2], pc[8]
    flax_pool = scope or "roi_pool"

    def tf_name(sub):
        return f"{scope}/{sub}" if scope else sub

    for i in range(len(align_channels)):
        conv_map[(flax_pool, "align", f"conv{i}")] = tf_name(f"conv{i}")
    if pool_type == "PointsPool":
        for i in range(len(pc[6])):
            conv_map[(flax_pool, "vfe", f"conv{i}")] = tf_name(f"vfe/conv{i}")
    return conv_map


def convert_tf_checkpoint(ckpt_path: str, cfg, variables,
                          stage: str = "FIRST_STAGE", strict: bool = False,
                          log=print):
    """Load a reference TF checkpoint into a copy of `variables`
    (the flax {'params', 'batch_stats'} dict). Returns the new variables and
    the list of unmatched flax conv paths."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    available = set(reader.get_variable_to_shape_map().keys())
    if cfg.MODEL.TYPE == "DoubleStage":
        conv_map = build_two_stage_name_map(cfg)
    else:
        conv_map = build_name_map(cfg, stage)

    import flax

    flat_params = flax.traverse_util.flatten_dict(variables["params"])
    flat_stats = flax.traverse_util.flatten_dict(variables["batch_stats"])
    missing = []
    loaded = 0

    def fetch(name):
        return np.asarray(reader.get_tensor(name))

    for path, tf_prefix in conv_map.items():
        kernel_key = path + ("conv", "kernel")
        if kernel_key not in flat_params:
            continue  # head variant not present in this model
        if f"{tf_prefix}/weights" not in available:
            missing.append("/".join(path))
            continue
        w = fetch(f"{tf_prefix}/weights")
        w = w.reshape(w.shape[-2], w.shape[-1])  # [1(,1),in,out] -> [in,out]
        assert flat_params[kernel_key].shape == w.shape, (path, w.shape)
        flat_params[kernel_key] = w
        if f"{tf_prefix}/biases" in available:
            flat_params[path + ("conv", "bias")] = fetch(f"{tf_prefix}/biases")
        loaded += 1
        bn_scale = path + ("bn", "scale")
        if bn_scale in flat_params and f"{tf_prefix}/bn/gamma" in available:
            flat_params[bn_scale] = fetch(f"{tf_prefix}/bn/gamma")
            flat_params[path + ("bn", "bias")] = fetch(f"{tf_prefix}/bn/beta")
            flat_stats[path + ("bn", "mean")] = fetch(
                f"{tf_prefix}/bn/moving_mean"
            )
            flat_stats[path + ("bn", "var")] = fetch(
                f"{tf_prefix}/bn/moving_variance"
            )

    if missing:
        log(f"checkpoint conversion: {loaded} convs loaded, "
            f"{len(missing)} unmatched: {missing[:8]}")
        if strict:
            raise KeyError(f"unmatched flax paths: {missing}")
    import jax.numpy as jnp

    new_params = flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flat_params.items()}
    )
    new_stats = flax.traverse_util.unflatten_dict(
        {k: jnp.asarray(v) for k, v in flat_stats.items()}
    )
    return {"params": new_params, "batch_stats": new_stats}, missing
