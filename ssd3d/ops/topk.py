"""Sort-free exact top-k for score prefiltering.

`lax.top_k` over a long axis lowers to a full stable sort on TPU
(~100 ms at n=16384 — the documented trap this repo's selection machinery
exists to avoid). The proposal prefilter (`ops/nms.py class_unaware_nms`)
only needs the top-k SET, not a sorted order: the NMS that consumes it
re-sorts its (much smaller) candidate window anyway, and jnp.argsort is
stable, so any index-ascending emission of the same set yields identical
final detections.

`top_k_set` finds the exact k-th-largest threshold with a 4-pass radix
select over order-preserving uint32 keys (histograms via one-hot MXU
matmuls — no sort, no gather), then materializes the set as
(idx-ascending) indices with the same first-k selection used by the ball
query (`grouping._first_k_selection`). Ties at the threshold are broken
by lowest index, exactly like lax.top_k, so the selected SET matches
bit-for-bit (asserted against lax.top_k in tests/test_ops.py).

No reference counterpart: the reference streams all candidates through
tf.image.non_max_suppression (postprocessor.py:84) and never prefilters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssd3d.ops.grouping import _first_k_selection, _order_key

Array = jax.Array


def top_k_set(scores: Array, k: int):
    """scores: [b, n] -> (idx int32 [b, k], valid bool [b, k]).

    The exact top-k set per row (threshold ties broken by lowest index),
    emitted in ascending-index order. valid is all-True when n >= k.
    """
    b, n = scores.shape
    key = _order_key(scores)  # [b, n]
    still = jnp.ones((b, n), bool)  # prefix-tied elements
    in_mask = jnp.zeros((b, n), bool)  # strictly above threshold
    need = jnp.full((b,), min(k, n), jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)

    for shift in (24, 16, 8, 0):
        byte = ((key >> shift) & jnp.uint32(0xFF)).astype(jnp.int32)
        onehot = (byte[:, :, None] == bins[None, None, :]).astype(
            jnp.float32
        ) * still[:, :, None]
        hist = jnp.einsum(
            "bnc->bc", onehot, preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [b, 256]
        # gt_cnt[c] = number of still-elements with byte > c
        rev = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]  # >= c
        gt_cnt = rev - hist  # > c
        # selected bin: the unique c with gt_cnt[c] < need <= rev[c]
        # (uniqueness: any such bin has hist[c] > 0, and rev/gt_cnt are
        # nonincreasing in c... note bins index ascending = byte value)
        ok = (gt_cnt < need[:, None]) & (rev >= need[:, None])
        sel_bin = jnp.max(jnp.where(ok, bins[None, :], -1), axis=1)
        need = need - jnp.take_along_axis(
            gt_cnt, sel_bin[:, None], axis=1
        )[:, 0]
        in_mask = in_mask | (still & (byte > sel_bin[:, None]))
        still = still & (byte == sel_bin[:, None])

    # k slots: all of in_mask (cg per row), then the first `need` of still
    cg = jnp.sum(in_mask, axis=1).astype(jnp.int32)
    idx_gt, _ = _first_k_selection(in_mask, k)
    idx_eq, _ = _first_k_selection(still, k)
    slots = jnp.arange(k, dtype=jnp.int32)
    from_eq = jnp.clip(slots[None, :] - cg[:, None], 0, k - 1)
    idx = jnp.where(
        slots[None, :] < cg[:, None],
        idx_gt,
        jnp.take_along_axis(idx_eq, from_eq, axis=1),
    )
    valid = slots[None, :] < jnp.minimum(jnp.int32(n), k)
    # ascending-index emission (idx_gt/idx_eq are each ascending; the
    # concatenation is not, and downstream stable argsorts don't care —
    # but normalize anyway so the contract is simple)
    idx = jnp.sort(jnp.where(valid, idx, n), axis=1)
    idx = jnp.minimum(idx, n - 1).astype(jnp.int32)
    return idx, valid
