"""Pallas kernel: fused SA-scale grouping — gather + center-subtract +
pointwise MLP (BN folded) + max-pool, one kernel per radius scale.

The unfused inference path materializes [b, m, ns, c] grouped tensors in HBM
(Pallas row gather), relays them out for the MLP convs (XLA picks an
m-minor layout for the channel contraction, forcing ~4 ms/step of pure
copies at flagship scale), runs the conv stack, and reduces. Here the
gathered rows never leave VMEM: each grid step gathers a query tile's rows
with dynamic sublane slices (the ops/pallas/gather.py pattern), subtracts
the centers, runs the (bf16 matmul + f32 BN affine + ReLU) chain on the MXU,
and writes only the [TM, c_out] pooled result.

Numerics mirror the unfused eval path. With bf16 weights (compute_dtype
bfloat16) inputs/kernels cast to bf16 for the dot (flax Dense(dtype=bf16)),
bias added in bf16; with f32 weights (compute_dtype None — the two-stage
configs) the dots run at DEFAULT precision, exactly matching the unfused
f32 path's jnp.dot lowering on TPU (single bf16 pass, f32 accumulate). Either way BatchNorm eval reduces to a
f32 affine y * inv + shift with inv = rsqrt(var + eps) * scale,
shift = bias - mean * inv, then ReLU. Inference only (the train path keeps
the unfused modules: batch statistics need the full grouped tensor).

History: built and retired in round 2 for the FLAGSHIP regime (b=8, n up to
16k: the serial in-kernel gather starved the MXU and lost to the unfused
overlap, 121.7 vs 150.9 scans/s — commit 4c96451). Resurrected in round 5
for the RoI regime (two-stage RCNN: b = batch x proposals = hundreds of
clouds of n<=512), where the unfused path's HBM materialization of the
grouped [400, 128, 64, 259] tensor dominates the whole two-stage step
(92 of 153 ms/step in the pre-fix trace, git 6b90509) and the VMEM-
resident fusion removes that traffic entirely (post-pass step:
61.5 ms at batch 4, trace_two_stage_b4.json).

Replaces, per scale, the composition of reference CUDA GroupPoint +
conv2d MLP + max pooling (lib/utils/layers_util.py:152-181).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_U = 16  # gathered rows per unrolled loop body (one aligned [U, c] store)


def _apply_layer(x, w, b, inv, shift):
    """One folded conv+BN+ReLU. The weight dtype selects the dot chain:
    bf16 weights reproduce the compute_dtype=bfloat16 eval path bit-for-bit;
    f32 weights run the dot at DEFAULT precision — exactly what the unfused
    f32 path's jnp.dot does on TPU (single bf16 pass, f32 accumulate), so
    this is the parity-faithful choice AND ~6x cheaper on the MXU than
    HIGHEST (measured: the RCNN layer-1 kernel at HIGHEST was 25.8 ms/step,
    dominated by the 6-pass operand split)."""
    if w.dtype == jnp.bfloat16:
        y = jnp.dot(
            x.astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + b[None, :]
        y = y.astype(jnp.float32)
    else:
        y = jnp.dot(
            x.astype(jnp.float32), w,
            preferred_element_type=jnp.float32,
        ) + b[None, :]
    return jnp.maximum(y * inv[None, :] + shift[None, :], 0.0)


def _kernel(ns: int, tm: int, cf: int, n_layers: int,
            idx_ref, src_ref, ctr_ref, *refs):
    """idx_ref: [TM*ns] int32 SMEM; src_ref: [1, n, cp] VMEM (cp = cf + 3,
    features then xyz); ctr_ref: [1, TM, 3]; refs: per layer (w [ci, co]
    bf16, b [1, co] bf16, inv [1, co] f32, shift [1, co] f32), then the
    output ref [1, TM, c_out], then the [TM*ns, cp] gather scratch."""
    out_ref = refs[4 * n_layers]
    g_ref = refs[4 * n_layers + 1]
    rows = tm * ns

    def body(r, carry):
        gathered = [
            src_ref[0, pl.ds(idx_ref[r * _U + u], 1), :] for u in range(_U)
        ]
        g_ref[pl.ds(r * _U, _U), :] = jnp.concatenate(gathered, axis=0)
        return carry

    lax.fori_loop(0, rows // _U, body, 0)

    x = g_ref[:]  # [rows, cp]
    ctr = ctr_ref[0]  # [TM, 3]
    ctr_rows = jnp.broadcast_to(
        ctr[:, None, :], (tm, ns, 3)
    ).reshape(rows, 3)
    x = jnp.concatenate([x[:, :cf], x[:, cf:] - ctr_rows], axis=-1)

    for i in range(n_layers):
        x = _apply_layer(x, refs[4 * i][:], refs[4 * i + 1][0],
                         refs[4 * i + 2][0], refs[4 * i + 3][0])

    c_out = x.shape[-1]
    out_ref[0] = jnp.max(x.reshape(tm, ns, c_out), axis=1)


@functools.partial(jax.jit, static_argnums=(4,))
def _sa_fused_raw(src: Array, idx: Array, centers: Array, layers, dims):
    ns, tm, cf, n_layers, _dots_bf16 = dims
    b, n, cp = src.shape
    m = idx.shape[1]
    mt = m // tm
    idx_flat = idx.astype(jnp.int32).reshape(b * mt * tm * ns)
    c_out = layers[-1][0].shape[1]

    dot_dt = jnp.bfloat16 if dims[-1] else jnp.float32
    layer_ins = []
    layer_specs = []
    for (w, bb, inv, shift) in layers:
        layer_ins += [
            w.astype(dot_dt),
            bb.astype(dot_dt).reshape(1, -1),
            inv.astype(jnp.float32).reshape(1, -1),
            shift.astype(jnp.float32).reshape(1, -1),
        ]
        layer_specs += [
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(_kernel, ns, tm, cf, n_layers)
    out = pl.pallas_call(
        kernel,
        grid=(b, mt),
        in_specs=[
            pl.BlockSpec((tm * ns,), lambda i, j, mt=mt: (i * mt + j,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, cp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ] + layer_specs,
        out_specs=pl.BlockSpec((1, tm, c_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, c_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm * ns, cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(idx_flat, src.astype(jnp.float32), centers.astype(jnp.float32),
      *layer_ins)
    return out


def _pick_tm(m: int, ns_max: int) -> int:
    """Query-tile size: the largest power-of-two divisor of m whose gathered
    row count tm*ns_max stays within the ~4096-row VMEM scratch budget."""
    tm = m & -m  # largest power-of-two divisor of m
    while tm * ns_max > 4096 and tm > 1:
        tm //= 2
    return tm


def supports(src: Array, ns: int, m: int) -> bool:
    """Envelope: f32 source cloud VMEM-resident (lane-padded), a valid
    power-of-two query tile exists (>= 8 sublanes even at the smallest
    fallback tile), and the unrolled [_U, c] stores stay aligned for any
    tile the multi-scale variant may pick (tm >= 8 and ns even)."""
    b, n, cp = src.shape
    lanes = -(-cp // 128) * 128
    return (
        src.dtype == jnp.float32
        and n % 8 == 0
        and n * lanes * 4 <= 12 * 1024 * 1024
        and m % 8 == 0
        and ns % 2 == 0
        and _pick_tm(m, ns) >= 8
    )


def _kernel_multi(ns_list, tm: int, cf: int, nl_list, has_agg: bool,
                  *refs):
    """Whole-SA-layer kernel: every radius scale's gather + MLP + masked
    max-pool, then the aggregation conv, in one pass over the query tile.

    refs layout: R idx refs (SMEM [TM*ns_k]); src [1, n, cp]; ctr [1, TM, 3];
    masks [1, TM, R]; per scale per layer (w, b, inv, shift); optionally the
    aggregation layer's (w, b, inv, shift); output [1, TM, c_out]; gather
    scratch [max_rows, cp]."""
    R = len(ns_list)
    pos = R
    src_ref = refs[pos]; ctr_ref = refs[pos + 1]; mask_ref = refs[pos + 2]
    pos += 3
    layer_refs = []
    for k in range(R):
        layer_refs.append(refs[pos:pos + 4 * nl_list[k]])
        pos += 4 * nl_list[k]
    agg_refs = None
    if has_agg:
        agg_refs = refs[pos:pos + 4]
        pos += 4
    out_ref = refs[pos]
    g_ref = refs[pos + 1]

    ctr = ctr_ref[0]  # [TM, 3]
    pooled_scales = []
    for k, ns in enumerate(ns_list):
        rows = tm * ns
        idx_ref = refs[k]

        def body(r, carry, idx_ref=idx_ref):
            gathered = [
                src_ref[0, pl.ds(idx_ref[r * _U + u], 1), :]
                for u in range(_U)
            ]
            g_ref[pl.ds(r * _U, _U), :] = jnp.concatenate(gathered, axis=0)
            return carry

        lax.fori_loop(0, rows // _U, body, 0)
        x = g_ref[pl.ds(0, rows), :]
        ctr_rows = jnp.broadcast_to(
            ctr[:, None, :], (tm, ns, 3)
        ).reshape(rows, 3)
        x = jnp.concatenate([x[:, :cf], x[:, cf:] - ctr_rows], axis=-1)
        for i in range(nl_list[k]):
            x = _apply_layer(x, layer_refs[k][4 * i][:],
                             layer_refs[k][4 * i + 1][0],
                             layer_refs[k][4 * i + 2][0],
                             layer_refs[k][4 * i + 3][0])
        ck = x.shape[-1]
        pooled = jnp.max(x.reshape(tm, ns, ck), axis=1)
        pooled_scales.append(pooled * mask_ref[0, :, k:k + 1])

    feat = jnp.concatenate(pooled_scales, axis=-1)
    if has_agg:
        feat = _apply_layer(feat, agg_refs[0][:], agg_refs[1][0],
                            agg_refs[2][0], agg_refs[3][0])
    out_ref[0] = feat


@functools.partial(jax.jit, static_argnums=(5,))
def _sa_multi_raw(src, idx_list, centers, masks, scale_params, dims):
    ns_list, tm, cf, nl_list, has_agg, _dots_bf16 = dims
    b, n, cp = src.shape
    m = centers.shape[1]
    mt = m // tm
    R = len(ns_list)

    ins = []
    specs = []
    for k, idx in enumerate(idx_list):
        ins.append(idx.astype(jnp.int32).reshape(b * mt * tm * ns_list[k]))
        specs.append(
            pl.BlockSpec((tm * ns_list[k],),
                         lambda i, j, mt=mt: (i * mt + j,),
                         memory_space=pltpu.SMEM)
        )
    ins += [src.astype(jnp.float32), centers.astype(jnp.float32),
            masks.astype(jnp.float32)]
    specs += [
        pl.BlockSpec((1, n, cp), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm, R), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    dot_dt = jnp.bfloat16 if dims[-1] else jnp.float32
    c_out = None
    for (w, bb, inv, shift) in scale_params:
        ins += [
            w.astype(dot_dt),
            bb.astype(dot_dt).reshape(1, -1),
            inv.astype(jnp.float32).reshape(1, -1),
            shift.astype(jnp.float32).reshape(1, -1),
        ]
        specs += [
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        c_out = w.shape[1]
    if not has_agg:
        # output channels = concat of per-scale last-layer widths
        c_out = 0
        off = 0
        for k in range(R):
            off += nl_list[k]
            c_out += scale_params[off - 1][0].shape[1]

    max_rows = tm * max(ns_list)
    kernel = functools.partial(
        _kernel_multi, tuple(ns_list), tm, cf, tuple(nl_list), has_agg
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, mt),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, tm, c_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, c_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((max_rows, cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(*ins)
    return out


def sa_fused_multi(src: Array, idx_list, centers: Array, masks: Array,
                   layers_list, agg_layer=None,
                   dots_bf16: bool = True) -> Array:
    """All radius scales of one SA layer + the aggregation conv in a single
    kernel. src: [b, n, cf+3]; idx_list: per scale int32 [b, m, ns_k]
    (pre-masked); centers: [b, m, 3]; masks: [b, m, R] f32 (has-points per
    scale, applied to each pooled scale BEFORE aggregation, matching the
    unfused order); layers_list: per scale a list of (kernel, bias, inv,
    shift); agg_layer: optional (kernel, bias, inv, shift) for the
    aggregation PointConv. Returns [b, m, c_out] f32."""
    b, m, _ = idx_list[0].shape
    cf = src.shape[-1] - 3
    ns_list = [idx.shape[2] for idx in idx_list]
    tm = _pick_tm(m, max(ns_list))
    if tm < 8 or any((tm * ns) % _U for ns in ns_list):
        raise ValueError(
            f"unsupported SA-multi shape m={m} ns={ns_list} (tm={tm}); "
            f"gate the call with supports() per scale"
        )
    scale_params = []
    nl_list = []
    for layers in layers_list:
        nl_list.append(len(layers))
        scale_params += list(layers)
    if agg_layer is not None:
        scale_params.append(agg_layer)
    return _sa_multi_raw(
        src, tuple(idx_list), centers, masks, tuple(scale_params),
        (tuple(ns_list), tm, cf, tuple(nl_list), agg_layer is not None,
         bool(dots_bf16)),
    )


def sa_fused_pallas(src: Array, idx: Array, centers: Array, layers,
                    dots_bf16: bool = True) -> Array:
    """src: [b, n, cf+3] f32, rows = (features | xyz); idx: int32 [b, m, ns]
    (pre-masked: empty balls point at row 0); centers: [b, m, 3];
    layers: sequence of (kernel [ci, co] f32, bias [co], inv [co],
    shift [co]) — BN already folded to an affine.

    Returns the pooled [b, m, c_out] f32 features (unmasked; callers zero
    empty balls, as the unfused path does)."""
    b, m, ns = idx.shape
    cf = src.shape[-1] - 3
    tm = _pick_tm(m, ns)
    if tm < 8 or (tm * ns) % _U:
        raise ValueError(
            f"unsupported SA shape m={m} ns={ns} (tm={tm}); "
            f"gate the call with supports()"
        )
    return _sa_fused_raw(
        src, idx, centers, tuple(layers),
        (ns, tm, cf, len(layers), bool(dots_bf16)),
    )
