"""Neighborhood grouping ops: ball query (plain/dilated/ordered), grouping
gathers, box-interior queries, point-membership IoU.

TPU-native replacements for the reference CUDA grouping ops
(lib/utils/tf_ops/grouping/tf_grouping_g.cu). The CUDA kernels stream over the
n points per query with a sequential counter; on TPU the same contract is
expressed as a dense masked top-k so the whole thing is vectorized:

    "first nsample in-radius points, in index order, padded by repeating the
     first hit; count = number found (<= nsample)"        (tf_grouping_g.cu:245)

is exactly top-k over the key  `mask * (n - index)`:  valid points have
strictly decreasing positive keys by index, so top-k returns the lowest-index
valid points, already ordered.

Distances are computed per-coordinate (fused subtractions, no a²+b²-2ab
cancellation) so self-distance is exactly 0 — the dilated query's d==0
self-inclusion rule (tf_grouping_g.cu:335) holds bit-exactly. Work is chunked
over the query axis to bound the [chunk, n] live set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssd3d.core.geometry import canonicalize_points

Array = jax.Array

_QUERY_CHUNK = 1024  # queries processed per chunk; bounds [chunk, n] buffers


def _pairwise_dist2(queries: Array, points: Array) -> Array:
    """Exact squared distances. queries: [m, 3], points: [n, 3] -> [m, n]."""
    diff = queries[:, None, :] - points[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def _first_k_selection(valid: Array, nsample: int, block: int = 512):
    """Select first-`nsample` true entries per row of `valid` [m, n].

    Returns (idx [m, nsample] int32, cnt [m] int32) with the CUDA pad rule:
    slots beyond cnt repeat the first selected index (0 when cnt == 0).

    Implementation: entirely gather/sort-free (both are pathological on TPU —
    a top_k over `n - index` keys lowers to a full 16k stable sort per row,
    ~100 ms per radius scale, and a cumsum binary search needs lane-dim
    gathers at ~85 ms per step). The mask is viewed as `block`-wide blocks
    packed into block/16 x 16-bit words (exactly representable in f32, so
    one-hot MXU matmuls can move them): block popcounts + their exclusive
    prefix locate each output slot's block with dense comparisons, the
    block's PACKED bitmask (block/16 floats, not `block`) is fetched with a
    one-hot matmul, and the in-block position is a popcount binary search —
    all elementwise. `block` trades coarse-level work (~nb per slot) against
    fine-level work (~block/16 per slot)."""
    m, n = valid.shape
    W = 16
    pad = (-n) % block
    if pad:
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    nb = (n + pad) // block
    words = _pack_words(valid.reshape(m, nb, block // W, W))
    return _select_from_words(words, nsample, n)


def _pack_words(valid4d: Array) -> Array:
    """bool [m, nb, 8, 16] -> packed 16-bit words as exact f32 [m, nb, 8]."""
    W = valid4d.shape[-1]
    bitw = jnp.asarray([float(1 << j) for j in range(W)], jnp.float32)
    return jnp.sum(valid4d.astype(jnp.float32) * bitw, axis=-1)


def _excl_prefix(x: Array) -> Array:
    """Exclusive prefix sum over the last axis via a strict-upper-triangular
    f32 matmul. jnp.cumsum lowers to a reduce-window whose scanned axis lands
    on the lane dimension (8/128 utilization, ~10 GB/s measured); the matmul
    form fuses and rides the MXU. Pinned to Precision.HIGHEST because the
    summand values (block counts up to `block` = 512) exceed bf16's exact
    integer range (256) — the default single bf16 pass truncates operands."""
    k = x.shape[-1]
    tri = jnp.triu(jnp.ones((k, k), jnp.float32), k=1)
    out = jnp.einsum(
        "...a,ac->...c", x.astype(jnp.float32), tri,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(x.dtype)


def _excl_prefix_axis(x: Array, axis: int) -> Array:
    """_excl_prefix over an arbitrary axis (same triangular-matmul form,
    contraction placed on `axis` so no transposes are materialized —
    query-trailing callers scan a leading/middle axis)."""
    k = x.shape[axis]
    tri = jnp.triu(jnp.ones((k, k), jnp.float32), k=1)
    xf = x.astype(jnp.float32)
    letters = "abcdefgh"[: x.ndim]
    src = letters[:axis] + "z" + letters[axis + 1:]
    out = jnp.einsum(
        f"z{letters[axis]},{src}->{letters}", tri, xf,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(x.dtype)


def _select_from_words(words: Array, nsample: int, n: int,
                       blk_cnt: Array | None = None):
    """First-k selection from packed block bitmasks, query-major
    convenience form. words: [m, nb, wpb]; blk_cnt [m, nb] optional.
    Thin adapter over the query-TRAILING implementation (the layout the
    TPU hot path uses natively); the transposes here only cost on the
    jnp fallback path."""
    w_t = jnp.transpose(words, (1, 2, 0))
    c_t = None if blk_cnt is None else jnp.transpose(blk_cnt, (1, 0))
    return _select_from_words_t(w_t, nsample, n, c_t)


def _select_from_words_t(words: Array, nsample: int, n: int,
                         blk_cnt: Array | None = None):
    """First-k selection from packed block bitmasks, query axis TRAILING.

    words: [nb, wpb, m] (wpb 16-bit words per block, block size = 16*wpb
    points, m queries); blk_cnt [nb, m] optionally precomputed (the
    ring-words Pallas kernel emits it; otherwise derived from popcounts
    here). Returns (idx [m, nsample], cnt [m]).

    Why trailing: at m=4096 queries the per-slot dots here are thousands
    of tiny batched matmuls, and the TPU emitter lays their operands
    batch-in-lanes (m minor). Keeping m as the minor axis of EVERY
    intermediate lets the Pallas words/counts outputs flow in, and the
    dots flow on, with zero layout-assignment copies — the query-major
    form cost three 134 MB relayout copies per step at the flagship
    layer-1 scale (tools/dump_hlo.py).

    Exactness on TPU: any matmul whose OPERAND values exceed 256 must run
    at Precision.HIGHEST — the default single bf16 pass truncates the
    operand (e.g. prefix values near 16384 round to multiples of 128,
    packed words near 65535 round to 65536), which silently corrupts the
    selection. Observed on hardware: 4/4096 queries returned wrong
    neighbors at n=16384 before the HIGHEST pins below."""
    nb, wpb, m = words.shape
    W = 16
    BS = wpb * W
    if blk_cnt is None:
        pops = jax.lax.population_count(
            words.astype(jnp.uint32)
        ).astype(jnp.int32)
        blk_cnt = jnp.sum(pops, axis=1)  # [nb, m] values <= BS
    else:
        blk_cnt = blk_cnt.astype(jnp.int32)
    prefix = _excl_prefix_axis(blk_cnt, 0)  # exclusive over nb: [nb, m]
    slots = jnp.arange(nsample, dtype=jnp.int32)

    # slot s lives in the LAST block whose prefix <= s (empty blocks have
    # zero count, so overshooting them is harmless)
    le = prefix[:, None, :] <= slots[None, :, None]  # [nb, ns, m]
    blk_of = jnp.sum(le, axis=0, dtype=jnp.int32) - 1  # [ns, m]
    # prefix is nondecreasing, so the selected (= last le-true) block's
    # prefix is the masked maximum — one more reduce over the same le
    # tensor, fused with the blk_of reduce
    prefix_s = jnp.max(jnp.where(le, prefix[:, None, :], 0), axis=0)
    offset = slots[:, None] - prefix_s  # [ns, m] rank within block
    b_iota = jnp.arange(nb, dtype=jnp.int32)
    onehot = (b_iota[:, None, None] == blk_of[None]).astype(jnp.float32)
    words_s = jnp.einsum(
        "bsm,bwm->swm", onehot, words, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # word values up to 65535
    )  # [ns, wpb, m] packed bitmasks of the chosen block
    pops_s = jax.lax.population_count(
        words_s.astype(jnp.uint32)
    ).astype(jnp.int32)
    exc = _excl_prefix_axis(pops_s, 1)  # exclusive over wpb: [ns, wpb, m]
    w_of = jnp.sum(
        (exc <= offset[:, None, :]).astype(jnp.int32), axis=1
    ) - 1  # [ns, m]
    w_iota = jnp.arange(wpb, dtype=jnp.int32)
    sel = w_iota[None, :, None] == w_of[:, None, :]  # [ns, wpb, m]
    rank = offset - jnp.sum(jnp.where(sel, exc, 0), axis=1)  # rank in word
    word = jnp.sum(jnp.where(sel, words_s, 0.0), axis=1).astype(jnp.uint32)

    # position of the (rank+1)-th set bit in a 16-bit word: binary search
    # by popcount of the low half at each step
    pos = jnp.zeros_like(rank)
    for half in (8, 4, 2, 1):
        lowmask = jnp.uint32((1 << half) - 1)
        low_pop = jax.lax.population_count(word & lowmask).astype(jnp.int32)
        go_high = rank >= low_pop
        rank = jnp.where(go_high, rank - low_pop, rank)
        pos = jnp.where(go_high, pos + half, pos)
        word = jnp.where(go_high, word >> half, word & lowmask)

    local_j = w_of * W + pos
    idx = jnp.minimum(blk_of * BS + local_j, n - 1).astype(jnp.int32)

    # CUDA breaks at nsample, so the reported count is capped
    total = prefix[-1] + blk_cnt[-1]  # [m]
    cnt = jnp.minimum(total, nsample).astype(jnp.int32)
    idx = jnp.where(slots[:, None] < cnt[None, :], idx, idx[:1])
    idx = jnp.where(cnt[None, :] > 0, idx, 0)
    return jnp.transpose(idx, (1, 0)), cnt


def _chunked_query(points: Array, queries: Array, valid_fn, nsample: int):
    """Run a mask-based first-k query in chunks over the query axis.

    valid_fn(d2 [c, n], q_chunk [c, 3]) -> bool [c, n]."""
    m = queries.shape[0]
    chunk = min(_QUERY_CHUNK, m)
    pad = (-m) % chunk
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)

    def one(q_chunk):
        d2 = _pairwise_dist2(q_chunk, points)
        return _first_k_selection(valid_fn(d2, q_chunk), nsample)

    idx, cnt = jax.lax.map(one, q)
    return idx.reshape(-1, nsample)[:m], cnt.reshape(-1)[:m]


def _batched(fn):
    """Lift a per-cloud fn to [b, ...] via vmap."""
    return jax.vmap(fn)


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query(radius: float, nsample: int, xyz: Array, new_xyz: Array):
    """First-nsample points with d < radius (tf_grouping_g.cu:215).

    xyz: [b, n, 3], new_xyz: [b, m, 3] -> (idx [b, m, nsample], cnt [b, m])."""
    r2 = radius * radius

    def per_cloud(pts, qs):
        return _chunked_query(pts, qs, lambda d2, _: d2 < r2, nsample)

    return _batched(per_cloud)(xyz, new_xyz)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def ball_query_dilated(
    min_radius: float, max_radius: float, nsample: int, xyz: Array, new_xyz: Array
):
    """Annulus query min_r <= d < max_r, self point (d == 0) always included
    (tf_grouping_g.cu:308 — 3DSSD's dilated grouping)."""
    lo2, hi2 = min_radius * min_radius, max_radius * max_radius

    def per_cloud(pts, qs):
        def valid(d2, _):
            return ((d2 >= lo2) & (d2 < hi2)) | (d2 == 0.0)

        return _chunked_query(pts, qs, valid, nsample)

    return _batched(per_cloud)(xyz, new_xyz)


def ball_query_multi(
    radius_list,
    nsample_list,
    xyz: Array,
    new_xyz: Array,
    dilated: bool = False,
    use_pallas: bool = True,
):
    """All radius scales of one SA layer in a single distance pass.

    The reference issues one CUDA ball query per radius (layers_util.py:134-147),
    re-reading the point cloud each time; here the [chunk, n] distance tile is
    computed once and every scale's first-k selection reads it. Returns lists
    of (idx, cnt) per radius. With dilated=True, scale i selects the annulus
    (radius_{i-1}, radius_i] plus the d == 0 self point (3DSSD dilated_group).

    On TPU the distance + ring-mask packing runs as one Pallas kernel
    (ssd3d/ops/pallas/ring_words.py) that never materializes the distance
    matrix in HBM; the jnp path below is the reference implementation.
    """
    specs = []
    for i, (r, ns) in enumerate(zip(radius_list, nsample_list)):
        lo = radius_list[i - 1] if (dilated and i > 0) else 0.0
        specs.append((lo * lo, r * r, ns, dilated and i > 0))

    n = xyz.shape[1]
    if use_pallas and jax.default_backend() == "tpu" and n % 2048 == 0:
        from ssd3d.ops.pallas.ring_words import BLOCK, ring_words_pallas

        rings = tuple((lo2, hi2, annulus) for lo2, hi2, _, annulus in specs)
        # neighborhood selection is non-differentiable (reference op has no
        # gradient); also required for grad tracing through the Pallas call
        words_list, cnts_list = ring_words_pallas(
            jax.lax.stop_gradient(xyz), jax.lax.stop_gradient(new_xyz), rings
        )  # per ring: words [b, n/16, m], counts [b, n/BLOCK, m]
        b, m = new_xyz.shape[:2]
        outs = []
        for k, (_, _, ns, _) in enumerate(specs):
            # both kernel outputs are query-trailing; the (nb, wpb) split
            # of the word axis is a non-minor reshape, so everything
            # reaches the query-trailing selection as a pure bitcast
            wk = words_list[k].reshape(b, n // BLOCK, BLOCK // 16, m)
            idx, cnt = jax.vmap(
                lambda w, c, ns=ns: _select_from_words_t(w, ns, n, c)
            )(wk, cnts_list[k])
            outs.append((idx, cnt))
        return outs

    def per_cloud(pts, qs):
        m = qs.shape[0]
        n = pts.shape[0]
        chunk = min(_QUERY_CHUNK, m)
        pad = (-m) % chunk
        q = jnp.pad(qs, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        pad_n = (-n) % 128
        nb = (n + pad_n) // 128

        def one(q_chunk):
            d2 = _pairwise_dist2(q_chunk, pts)
            if pad_n:
                d2 = jnp.pad(d2, ((0, 0), (0, pad_n)),
                             constant_values=jnp.inf)
            # ring predicates evaluated on the block view so the packed
            # words fuse straight out of the distance computation (no
            # full-width bool mask materialized / relaid out)
            d2v = d2.reshape(chunk, nb, 8, 16)
            outs = []
            for lo2, hi2, ns, annulus in specs:
                if annulus:
                    valid = ((d2v >= lo2) & (d2v < hi2)) | (d2v == 0.0)
                else:
                    valid = d2v < hi2
                words = _pack_words(valid)
                outs.append(_select_from_words(words, ns, n))
            return tuple(outs)

        results = jax.lax.map(one, q)
        return tuple(
            (idx.reshape(-1, ns)[:m], cnt.reshape(-1)[:m])
            for (idx, cnt), (_, _, ns, _) in zip(results, specs)
        )

    per_radius = _batched(per_cloud)(xyz, new_xyz)
    return list(per_radius)


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_withidx(
    radius: float, nsample: int, xyz: Array, new_xyz: Array, sort_idx: Array
):
    """Ball query visiting points in a caller-supplied order per query
    (attention grouping, tf_grouping_g.cu:260). sort_idx: [b, m, n].

    The first-k rule applies in sort order: rank r is valid if the point at
    sort_idx[r] is in-radius; selected entries are mapped back through
    sort_idx."""
    r2 = radius * radius

    def per_cloud(pts, qs, order):
        m = qs.shape[0]
        chunk = min(_QUERY_CHUNK, m)
        pad = (-m) % chunk
        qs_p = jnp.pad(qs, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        ord_p = jnp.pad(order, ((0, pad), (0, 0))).reshape(-1, chunk, order.shape[-1])

        def one(args):
            q_chunk, o_chunk = args
            d2 = _pairwise_dist2(q_chunk, pts)
            d2_sorted = jnp.take_along_axis(d2, o_chunk, axis=-1)
            rank_idx, cnt = _first_k_selection(d2_sorted < r2, nsample)
            idx = jnp.take_along_axis(o_chunk, rank_idx, axis=-1)
            return idx.astype(jnp.int32), cnt

        idx, cnt = jax.lax.map(one, (qs_p, ord_p))
        return idx.reshape(-1, nsample)[:m], cnt.reshape(-1)[:m]

    return _batched(per_cloud)(xyz, new_xyz, sort_idx)


def _order_key(s: Array) -> Array:
    """f32 -> uint32 whose unsigned order matches the float order
    (standard sign-flip transform; NaN-free inputs assumed). Shared with
    ops/topk.py."""
    b = jax.lax.bitcast_convert_type(s.astype(jnp.float32), jnp.uint32)
    return jnp.where(
        (b >> 31).astype(bool), ~b, b | jnp.uint32(0x80000000)
    )


_ATTN_CHUNK = 256  # queries per chunk; bounds the [b, chunk, n] live buffers


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_attention(radius: float, nsample: int, xyz: Array,
                         new_xyz: Array, feats: Array, new_feats: Array):
    """Attention-ordered ball query WITHOUT the per-query argsort.

    The reference sorts all n candidates by descending feature distance per
    query and takes the first nsample in-radius hits (layers_util.py:122-130
    driving tf_grouping_g.cu:260). On TPU that argsort lowers to a full
    stable sort per query — measured 0.31 scans/s with attention on every
    MSG layer (docs/kernels.md). This op computes the SAME emitted multiset
    sort-free: the nsample in-radius points with the LARGEST feature
    distance (threshold ties -> lowest index, exactly the stable argsort's
    tie rule), padded by repeating the first-visited member (the max-key
    hit), so grouped-feature max-pools AND training-mode BN statistics
    match the sorted-visitation path bit-for-bit. Only the within-row slot
    ORDER differs (index-ascending instead of distance-descending), which
    nothing downstream observes.

    The selection threshold is found by a 32-step bitwise bisection over
    order-preserving uint32 keys — compare+count passes only, no sort, no
    [m, n] gather. feats/new_feats: [b, n, cf] / [b, m, cf].
    """
    r2 = radius * radius

    def per_cloud(pts, qs, f, nf):
        m = qs.shape[0]
        n = pts.shape[0]
        chunk = min(_ATTN_CHUNK, m)
        pad = (-m) % chunk
        qs_p = jnp.pad(qs, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        nf_p = jnp.pad(nf, ((0, pad), (0, 0))).reshape(
            -1, chunk, nf.shape[-1]
        )

        def one(args):
            q_chunk, nf_chunk = args
            d2 = _pairwise_dist2(q_chunk, pts)
            in_r = d2 < r2
            # same distance form as the argsort path (square_distance's
            # HIGHEST-precision matmul) so near-ties resolve identically
            from ssd3d.core.geometry import square_distance

            key = _order_key(square_distance(nf_chunk, f))  # [chunk, n]

            def bit_body(i, t):
                cand = t | (jnp.uint32(1) << (31 - i))
                c = jnp.sum(
                    (key >= cand[:, None]) & in_r, axis=1
                ).astype(jnp.int32)
                return jnp.where(c >= nsample, cand, t)

            # largest T with count(in-radius keys >= T) >= nsample
            t = jax.lax.fori_loop(
                0, 32, bit_body, jnp.zeros((chunk,), jnp.uint32)
            )
            above = in_r & (key > t[:, None])
            tie = in_r & (key == t[:, None])
            idx_gt, _ = _first_k_selection(above, nsample)
            idx_eq, _ = _first_k_selection(tie, nsample)
            cg = jnp.sum(above, axis=1).astype(jnp.int32)
            total = jnp.sum(in_r, axis=1).astype(jnp.int32)
            cnt = jnp.minimum(total, nsample)
            slots = jnp.arange(nsample, dtype=jnp.int32)[None, :]
            from_eq = jnp.clip(slots - cg[:, None], 0, nsample - 1)
            idx = jnp.where(
                slots < cg[:, None], idx_gt,
                jnp.take_along_axis(idx_eq, from_eq, axis=1),
            )
            # pad rule: repeat the FIRST-VISITED member — max key, lowest
            # index on ties — so the multiset matches sorted visitation
            iota = jnp.arange(n, dtype=jnp.int32)[None, :]
            kmax = jnp.max(
                jnp.where(in_r, key, jnp.uint32(0)), axis=1
            )
            first = jnp.min(
                jnp.where(in_r & (key == kmax[:, None]), iota, n), axis=1
            )
            first = jnp.minimum(first, n - 1).astype(jnp.int32)
            idx = jnp.where(slots < cnt[:, None], idx, first[:, None])
            idx = jnp.where(cnt[:, None] > 0, idx, 0)
            return idx.astype(jnp.int32), cnt

        idx, cnt = jax.lax.map(one, (qs_p, nf_p))
        return idx.reshape(-1, nsample)[:m], cnt.reshape(-1)[:m]

    return _batched(per_cloud)(xyz, new_xyz, feats, new_feats)


def group_points(points: Array, idx: Array) -> Array:
    """points: [b, n, c], idx: int [b, m, s] -> [b, m, s, c].

    Contract note: CUDA GroupPoint (tf_grouping_g.cu:362) maps idx == -1 to
    zeros; here indices must be in [0, n) (negative/overflowing indices
    clamp). No in-repo producer emits -1 — ball queries pad by repeating the
    first hit and the RoI poolers sanitize empty boxes to index 0 before
    gathering (two_stage.py RegionPool/PointsPool).

    Replaces CUDA GroupPoint. XLA's row gather costs
    ~4-6 ns per ROW on TPU regardless of width, so narrow sources (the hot
    layer-1 case: 4-channel packed xyz+feature rows, ~4.2M rows per batch-8
    step) dispatch to a Pallas kernel that keeps the cloud VMEM-resident and
    copies rows with dynamic sublane slices — bit-identical to
    take_along_axis, ~1.9x faster, scatter-add VJP (the CUDA GroupPointGrad
    contract). Wide sources stay on XLA's gather, which wins there
    (0.7 ns/row at c=67)."""
    b, m, s = idx.shape
    c = points.shape[-1]
    flat = idx.reshape(b, m * s)
    if _USE_PALLAS_GATHER and jax.default_backend() == "tpu":
        from ssd3d.ops.pallas import gather as pg

        if pg.supports(points):
            return pg.gather_rows_pallas(points, flat).reshape(b, m, s, c)
        if c > 256:
            # Wide packed rows (e.g. the RCNN layer-1 grouping: 256-ch
            # features + 3 xyz = c=259): chunk the channel axis at lane-tile
            # boundaries so every piece rides the Pallas kernel. XLA's
            # element-rate gather measured 58 ms/step here (fusion.23,
            # benchmarks/trace_two_stage_b4.json: 3.28M rows x 259 ch,
            # 6.8 GB); the chunks are tile-aligned lane slices (no relayout)
            # and the consumer's split of the re-concatenated result
            # simplifies away.
            splits = [points[..., i:i + 256] for i in range(0, c, 256)]
            if all(pg.supports(p) for p in splits):
                parts = [pg.gather_rows_pallas(p, flat) for p in splits]
                return jnp.concatenate(parts, -1).reshape(b, m, s, c)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(b, m, s, points.shape[-1])


# Narrow-row gathers go through the Pallas dynamic-slice kernel
# (ssd3d/ops/pallas/gather.py). An earlier one-hot-matmul formulation lost
# to XLA (MXU underutilized at these tile shapes); the slice kernel wins
# ~1.9x per row at c<=16 on v5e.
_USE_PALLAS_GATHER = True


@functools.partial(jax.jit, static_argnums=(0,))
def knn_points(k: int, xyz: Array, new_xyz: Array):
    """k nearest neighbors (reference knn_point, tf_grouping.py:130).

    -> (dist2 [b, m, k], idx [b, m, k])."""

    def per_cloud(pts, qs):
        def one(q_chunk):
            d2 = _pairwise_dist2(q_chunk, pts)
            neg, idx = jax.lax.top_k(-d2, k)
            return -neg, idx.astype(jnp.int32)

        m = qs.shape[0]
        chunk = min(_QUERY_CHUNK, m)
        pad = (-m) % chunk
        qs_p = jnp.pad(qs, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        d, i = jax.lax.map(one, qs_p)
        return d.reshape(-1, k)[:m], i.reshape(-1, k)[:m]

    return _batched(per_cloud)(xyz, new_xyz)


# ---------------------------------------------------------------------------
# rotated-box interior queries (RoI pooling support)
# ---------------------------------------------------------------------------

def _points_in_box_mask(pts: Array, boxes: Array) -> Array:
    """pts: [n, 3], boxes: [m, 7] -> bool [m, n].

    Same test as CUDA point_inside_box_3d (tf_grouping_g.cu:27): canonical
    rotate into the box frame; y inside (by - h, by]; closed x/z bounds."""
    canon = canonicalize_points(
        jnp.broadcast_to(pts[None], (boxes.shape[0],) + pts.shape), boxes
    )  # [m, n, 3]
    l, h, w = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
    in_x = jnp.abs(canon[..., 0]) <= l / 2.0
    in_z = jnp.abs(canon[..., 2]) <= w / 2.0
    # CUDA prefilter: y > by excluded, (by - y) > h excluded
    in_y = (canon[..., 1] <= 0.0) & (canon[..., 1] >= -h)
    return in_x & in_y & in_z


@functools.partial(jax.jit, static_argnums=(2,))
def query_boxes_3d_points(xyz: Array, boxes: Array, nsample: int):
    """First-nsample interior points per rotated box (tf_grouping_g.cu:46).

    xyz: [b, n, 3], boxes: [b, m, 7] -> (idx [b, m, nsample], cnt [b, m])."""

    def per_cloud(pts, bxs):
        valid = _points_in_box_mask(pts, bxs)  # [m, n]
        return _first_k_selection(valid, nsample)

    return _batched(per_cloud)(xyz, boxes)


@jax.jit
def query_boxes_3d_mask(xyz: Array, boxes: Array) -> Array:
    """Interior mask (tf_grouping_g.cu:100). -> int32 [b, m, n]."""

    def per_cloud(pts, bxs):
        return _points_in_box_mask(pts, bxs).astype(jnp.int32)

    return _batched(per_cloud)(xyz, boxes)


@jax.jit
def query_points_iou(
    xyz: Array, anchors: Array, gt_boxes: Array, iou_3d: Array
) -> Array:
    """PointsIoU(anchor, gt) = |pts in both| / |pts in either|, gated by
    3D IoU > 1e-3 (tf_grouping_g.cu:139).

    xyz: [b, n, 3]; anchors: [b, a, 7]; gt_boxes: [b, g, 7];
    iou_3d: [b, a, g] -> [b, a, g]."""

    def per_cloud(pts, an, gt, gate):
        in_a = _points_in_box_mask(pts, an).astype(jnp.float32)  # [a, n]
        in_g = _points_in_box_mask(pts, gt).astype(jnp.float32)  # [g, n]
        inter = jnp.einsum(
            "an,gn->ag", in_a, in_g, preferred_element_type=jnp.float32
        )
        cnt_a = jnp.sum(in_a, axis=-1)[:, None]
        cnt_g = jnp.sum(in_g, axis=-1)[None, :]
        union = jnp.maximum(cnt_a + cnt_g - inter, 1.0)
        return jnp.where(gate >= 1e-3, inter / union, 0.0)

    return _batched(per_cloud)(xyz, anchors, gt_boxes, iou_3d)
