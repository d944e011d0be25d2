"""Neighborhood ops vs brute-force numpy oracles (the reference's own test
pattern: CUDA kernel vs numpy on real-ish data — tf_ops/grouping/test/test_op.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssd3d import ops
from ssd3d.core.geometry import square_distance

from conftest import random_boxes


def np_fps(xyz, m):
    """Oracle D-FPS matching tf_sampling_g.cu:124."""
    n = xyz.shape[0]
    out = np.zeros(m, np.int64)
    dist = np.full(n, np.inf)
    last = 0
    for j in range(1, m):
        d = ((xyz - xyz[last]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        last = int(np.argmax(dist))
        out[j] = last
    return out


def test_fps_matches_oracle(rng):
    xyz = rng.randn(2, 128, 3).astype(np.float32)
    got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 32))
    for b in range(2):
        np.testing.assert_array_equal(got[b], np_fps(xyz[b], 32))


def test_fps_spreads_points(rng):
    # FPS of a uniform cube should cover all octants quickly
    xyz = rng.uniform(-1, 1, size=(1, 512, 3)).astype(np.float32)
    idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 16))[0]
    sel = xyz[0][idx]
    octant = (sel > 0).astype(int) @ np.array([1, 2, 4])
    assert len(np.unique(octant)) == 8


def test_ffps_matches_oracle(rng):
    feats = rng.randn(2, 64, 8).astype(np.float32)
    dist = np.asarray(square_distance(jnp.asarray(feats), jnp.asarray(feats)))
    got = np.asarray(ops.farthest_point_sample_from_dist(jnp.asarray(dist), 16))
    for b in range(2):
        n = 64
        out = np.zeros(16, np.int64)
        d = np.full(n, np.inf)
        last = 0
        for j in range(1, 16):
            d = np.minimum(d, dist[b, last])
            last = int(np.argmax(d))
            out[j] = last
        np.testing.assert_array_equal(got[b], out)


def np_ball_query(xyz, new_xyz, radius, nsample, min_radius=0.0):
    """Oracle matching tf_grouping_g.cu:215/:308 (first-nsample, pad rule)."""
    m = new_xyz.shape[0]
    idx = np.zeros((m, nsample), np.int64)
    cnt = np.zeros(m, np.int64)
    for i in range(m):
        d = np.sqrt(((xyz - new_xyz[i]) ** 2).sum(-1))
        if min_radius > 0:
            valid = np.where(((d >= min_radius) & (d < radius)) | (d == 0))[0]
        else:
            valid = np.where(d < radius)[0]
        c = min(len(valid), nsample)
        if c > 0:
            idx[i, :] = valid[0]
            idx[i, :c] = valid[:c]
        cnt[i] = c
    return idx, cnt


def test_ball_query_matches_oracle(rng):
    xyz = rng.uniform(-3, 3, size=(2, 256, 3)).astype(np.float32)
    qi = rng.choice(256, size=64, replace=False)
    new_xyz = xyz[:, qi]
    idx, cnt = ops.ball_query(1.0, 16, jnp.asarray(xyz), jnp.asarray(new_xyz))
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for b in range(2):
        w_idx, w_cnt = np_ball_query(xyz[b], new_xyz[b], 1.0, 16)
        np.testing.assert_array_equal(cnt[b], np.minimum(w_cnt, 16))
        np.testing.assert_array_equal(idx[b], w_idx)


def test_ball_query_dilated_includes_self(rng):
    xyz = rng.uniform(-3, 3, size=(1, 128, 3)).astype(np.float32)
    new_xyz = xyz[:, :32]  # queries are dataset points -> d == 0 exactly
    idx, cnt = ops.ball_query_dilated(
        0.5, 1.5, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)
    )
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    w_idx, w_cnt = np_ball_query(xyz[0], new_xyz[0], 1.5, 8, min_radius=0.5)
    np.testing.assert_array_equal(cnt[0], np.minimum(w_cnt, 8))
    np.testing.assert_array_equal(idx[0], w_idx)
    # self index must appear in each row (d == 0 rule)
    for i in range(32):
        assert i in idx[0, i]


def test_ball_query_withidx_matches_oracle(rng):
    """Attention grouping: first-nsample-in-SUPPLIED-order contract
    (tf_grouping_g.cu:260 query_ball_point_withidx_gpu — visit points in
    sort_idx order, keep in-radius hits, pad by repeating the first hit)."""
    xyz = rng.uniform(-3, 3, size=(2, 128, 3)).astype(np.float32)
    qi = rng.choice(128, size=32, replace=False)
    new_xyz = xyz[:, qi]
    # a per-query random visiting order (the model uses descending feature
    # distance; the op contract holds for ANY permutation)
    order = np.stack([
        np.stack([rng.permutation(128) for _ in range(32)]) for _ in range(2)
    ]).astype(np.int32)
    idx, cnt = ops.ball_query_withidx(
        1.0, 8, jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(order)
    )
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for b in range(2):
        for i in range(32):
            d = np.sqrt(((xyz[b] - new_xyz[b, i]) ** 2).sum(-1))
            visited = order[b, i]
            hits = visited[d[visited] < 1.0]
            c = min(len(hits), 8)
            want = np.zeros(8, np.int64)
            if c > 0:
                want[:] = hits[0]
                want[:c] = hits[:c]
            np.testing.assert_array_equal(cnt[b, i], c)
            np.testing.assert_array_equal(idx[b, i], want)


def test_ball_query_empty_gives_zero(rng):
    xyz = np.ones((1, 64, 3), np.float32) * 100.0
    new_xyz = np.zeros((1, 4, 3), np.float32)
    idx, cnt = ops.ball_query(1.0, 8, jnp.asarray(xyz), jnp.asarray(new_xyz))
    assert np.asarray(cnt).sum() == 0
    np.testing.assert_array_equal(np.asarray(idx), 0)


def test_group_points_and_grad(rng):
    pts = rng.randn(2, 64, 8).astype(np.float32)
    idx = rng.randint(0, 64, size=(2, 16, 4)).astype(np.int32)
    out = np.asarray(ops.group_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], pts[b][idx[b]])

    # gradient = scatter-add (parity with the CUDA grad kernel's contract)
    def f(p):
        return jnp.sum(ops.group_points(p, jnp.asarray(idx)) * 2.0)

    grad = np.asarray(jax.grad(f)(jnp.asarray(pts)))
    want = np.zeros_like(pts)
    for b in range(2):
        for i in range(16):
            for s in range(4):
                want[b, idx[b, i, s]] += 2.0
    np.testing.assert_allclose(grad, want, atol=1e-5)


def test_three_nn_and_interpolate(rng):
    known = rng.randn(1, 32, 3).astype(np.float32)
    unknown = rng.randn(1, 48, 3).astype(np.float32)
    dist2, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    dist2, idx = np.asarray(dist2), np.asarray(idx)
    d_full = ((unknown[0][:, None] - known[0][None]) ** 2).sum(-1)
    want_idx = np.argsort(d_full, axis=1)[:, :3]
    np.testing.assert_array_equal(np.sort(idx[0], 1), np.sort(want_idx, 1))
    np.testing.assert_allclose(
        dist2[0], np.take_along_axis(d_full, idx[0], 1), rtol=1e-4, atol=1e-4
    )

    feats = rng.randn(1, 32, 6).astype(np.float32)
    from ssd3d.ops.interpolate import inverse_distance_weights

    w = inverse_distance_weights(jnp.asarray(dist2))
    out = np.asarray(ops.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), w))
    w_np = np.asarray(w)
    want = (feats[0][idx[0]] * w_np[0][..., None]).sum(1)
    np.testing.assert_allclose(out[0], want, rtol=1e-4, atol=1e-5)


def test_gather_by_mask(rng):
    pts = rng.randn(2, 32, 4).astype(np.float32)
    mask = (rng.rand(2, 32) > 0.7).astype(np.float32)
    mask[1] = 0  # empty case
    mask[1, 20] = 1
    out = np.asarray(ops.gather_by_mask(jnp.asarray(pts), jnp.asarray(mask), 8))
    for b in range(2):
        sel = np.where(mask[b])[0]
        want = np.zeros((8, 4), np.float32)
        c = min(len(sel), 8)
        if len(sel):
            want[:] = pts[b, sel[0]]
            want[:c] = pts[b, sel[:c]]
        np.testing.assert_array_equal(out[b], want)


def test_query_boxes_3d(rng):
    boxes = random_boxes(rng, 4)[None]  # [1, 4, 7]
    pts = rng.uniform(-25, 25, size=(1, 512, 3)).astype(np.float32)
    pts[..., 2] += 40
    # seed guaranteed interior points
    for k in range(4):
        pts[0, k * 10:(k + 1) * 10] = boxes[0, k, :3]
        pts[0, k * 10:(k + 1) * 10, 1] -= boxes[0, k, 4] / 2

    mask = np.asarray(ops.query_boxes_3d_mask(jnp.asarray(pts), jnp.asarray(boxes)))
    idx, cnt = ops.query_boxes_3d_points(jnp.asarray(pts), jnp.asarray(boxes), 16)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for k in range(4):
        interior = np.where(mask[0, k])[0]
        assert len(interior) >= 10
        c = min(len(interior), 16)
        assert cnt[0, k] == c
        np.testing.assert_array_equal(idx[0, k, :c], interior[:c])


def test_query_points_iou(rng):
    boxes = random_boxes(rng, 3)[None]
    pts = rng.uniform(-25, 25, size=(1, 256, 3)).astype(np.float32)
    from ssd3d.core.iou import boxes_iou_bev_3d

    _, iou3d = boxes_iou_bev_3d(jnp.asarray(boxes[0]), jnp.asarray(boxes[0]))
    got = np.asarray(
        ops.query_points_iou(
            jnp.asarray(pts), jnp.asarray(boxes), jnp.asarray(boxes), iou3d[None]
        )
    )[0]
    # identical boxes -> PointsIoU == 1 where any point inside, gated by iou>1e-3
    mask = np.asarray(ops.query_boxes_3d_mask(jnp.asarray(pts), jnp.asarray(boxes)))[0]
    for k in range(3):
        if mask[k].sum() > 0:
            assert got[k, k] == pytest.approx(1.0)


def test_nms_bev_matches_greedy(rng):
    n = 64
    boxes = rng.uniform(0, 10, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(1, 3, size=(n, 2)).astype(np.float32)
    bev = np.concatenate([boxes, boxes + wh], axis=1)
    scores = rng.rand(n).astype(np.float32)
    idx, valid = ops.nms_bev(jnp.asarray(bev), jnp.asarray(scores), 16, 0.3)
    idx, valid = np.asarray(idx), np.asarray(valid)

    # greedy oracle
    def iou(a, b):
        x1, z1 = max(a[0], b[0]), max(a[1], b[1])
        x2, z2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x2 - x1, 0) * max(z2 - z1, 0)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / max(ua, 1e-9)

    order = np.argsort(-scores)
    kept = []
    for i in order:
        if all(iou(bev[i], bev[j]) <= 0.3 for j in kept):
            kept.append(i)
        if len(kept) == 16:
            break
    np.testing.assert_array_equal(idx[valid], kept[: valid.sum()])
    assert valid.sum() == len(kept)


def test_knn(rng):
    xyz = rng.randn(1, 64, 3).astype(np.float32)
    q = rng.randn(1, 16, 3).astype(np.float32)
    d2, idx = ops.knn_points(4, jnp.asarray(xyz), jnp.asarray(q))
    d_full = ((q[0][:, None] - xyz[0][None]) ** 2).sum(-1)
    want = np.sort(d_full, axis=1)[:, :4]
    np.testing.assert_allclose(np.asarray(d2)[0], want, rtol=1e-4, atol=1e-4)


def test_iou_guided_nms_matches_oracle(rng):
    """Oracle re-derives cython_nms.pyx matrix_iou_guided_nms:226-265:
    visit in descending score*iou_3d, suppress iou >= thresh."""
    n = 48
    scores = rng.rand(n).astype(np.float32)
    iou_3d = rng.rand(n).astype(np.float32)
    # symmetric random "IoU" matrix with unit diagonal
    m = rng.rand(n, n).astype(np.float32)
    iou = (m + m.T) / 2
    np.fill_diagonal(iou, 1.0)

    idx, ens, valid = ops.iou_guided_nms(
        jnp.asarray(iou), jnp.asarray(scores), jnp.asarray(iou_3d), 16, 0.7
    )
    idx, ens, valid = np.asarray(idx), np.asarray(ens), np.asarray(valid)

    ensemble = scores * iou_3d
    order = np.argsort(-ensemble)
    suppressed = np.zeros(n, bool)
    kept = []
    for _i, i in enumerate(order):
        if suppressed[i]:
            continue
        kept.append(i)
        for j in order[_i + 1:]:
            if not suppressed[j] and iou[i, j] >= 0.7:
                suppressed[j] = True
    kept = kept[:16]
    np.testing.assert_array_equal(idx[valid], kept[: valid.sum()])
    np.testing.assert_allclose(ens[valid], ensemble[kept][: valid.sum()], rtol=1e-6)


def test_soft_nms_decays_overlaps(rng):
    n = 32
    boxes = rng.uniform(0, 10, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(1, 3, size=(n, 2)).astype(np.float32)
    bev = np.concatenate([boxes, boxes + wh], axis=1)
    scores = rng.rand(n).astype(np.float32)
    order, sel_scores, valid = ops.soft_nms_bev(
        jnp.asarray(bev), jnp.asarray(scores), 8
    )
    order, sel_scores = np.asarray(order), np.asarray(sel_scores)
    # first pick is the global max, scores monotonically non-increasing
    assert order[0] == int(np.argmax(scores))
    assert np.all(np.diff(sel_scores[np.asarray(valid)]) <= 1e-6)


def test_top_k_set_matches_lax_top_k():
    """Sort-free radix top-k must select the EXACT same set as lax.top_k
    (threshold ties broken by lowest index), including heavy-tie rows —
    it replaces the full-sort top_k in the proposal prefilter."""
    import jax
    import jax.numpy as jnp

    from ssd3d.ops.topk import top_k_set

    rng = np.random.RandomState(7)
    for n, k, quant in ((1000, 128, None), (4096, 512, 0.05),
                        (16384, 2048, 0.01), (100, 128, None)):
        s = rng.uniform(0, 1, (3, n)).astype(np.float32)
        if quant:  # force many exact ties incl. across the threshold
            s = (np.round(s / quant) * quant).astype(np.float32)
        s = jnp.asarray(s)
        kk = min(k, n)
        _, ref_idx = jax.lax.top_k(s, kk)
        idx, valid = top_k_set(s, k)
        assert bool(valid[:, :kk].all())
        if k > n:
            assert not bool(valid[:, n:].any())
        for b in range(3):
            got = set(np.asarray(idx[b][np.asarray(valid[b])]).tolist())
            want = set(np.asarray(ref_idx[b]).tolist())
            assert got == want, (n, k, quant, b,
                                 sorted(want - got)[:5], sorted(got - want)[:5])


def test_class_unaware_nms_pre_topk_matches_lax_topk_path():
    """The sort-free prefilter must leave class_unaware_nms's OUTPUT
    bit-identical to the lax.top_k formulation (same set + stable argsort
    downstream => same picks)."""
    import jax
    import jax.numpy as jnp

    from ssd3d.core.geometry import boxes_to_bev_aabb
    from ssd3d.ops import nms as nms_mod

    rng = np.random.RandomState(11)
    n = 4096
    boxes = np.zeros((2, n, 1, 7), np.float32)
    boxes[..., 0, 0] = rng.uniform(-40, 40, (2, n))
    boxes[..., 0, 1] = 1.6
    boxes[..., 0, 2] = rng.uniform(0, 70, (2, n))
    boxes[..., 0, 3:6] = rng.uniform(1.2, 4.5, (2, n, 3))
    scores = np.round(rng.uniform(0, 1, (2, n, 1)), 2).astype(np.float32)

    got = nms_mod.class_unaware_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 64, 0.7, pre_topk=512
    )

    def ref_path(boxes_3d, sc):
        best = jnp.max(sc, axis=-1)
        bx = boxes_3d[:, :, 0]
        top_s, top_i = jax.lax.top_k(best, 512)
        bx = jnp.take_along_axis(bx, top_i[..., None], axis=1)
        bev = boxes_to_bev_aabb(bx)

        def per_elem(b, v, s):
            idx, valid = nms_mod.nms_bev(v, s, 64, 0.7)
            return b[idx], jnp.where(valid, s[idx], 0.0), valid

        return jax.vmap(per_elem)(bx, bev, top_s)

    want = ref_path(jnp.asarray(boxes), jnp.asarray(scores))
    for g, w, name in zip(got, want, ("boxes", "scores", "valid")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=name)


def test_ball_query_attention_matches_sorted_visitation(rng):
    """Sort-free attention query: the emitted MULTISET (selected members +
    pad repeats) and count must equal the reference composition — argsort
    by descending feature distance, then first-nsample-in-order
    (ball_query_withidx). Only the within-row slot order may differ."""
    from ssd3d.core.geometry import square_distance

    xyz = rng.uniform(-3, 3, size=(2, 128, 3)).astype(np.float32)
    feats = rng.randn(2, 128, 6).astype(np.float32)
    qi = rng.choice(128, size=32, replace=False)
    new_xyz = xyz[:, qi]
    new_feats = feats[:, qi]

    relation = square_distance(jnp.asarray(new_feats), jnp.asarray(feats))
    order = jnp.argsort(-relation, axis=-1).astype(jnp.int32)
    for radius, ns in [(1.0, 8), (0.5, 8), (2.5, 16)]:
        w_idx, w_cnt = ops.ball_query_withidx(
            radius, ns, jnp.asarray(xyz), jnp.asarray(new_xyz), order
        )
        a_idx, a_cnt = ops.ball_query_attention(
            radius, ns, jnp.asarray(xyz), jnp.asarray(new_xyz),
            jnp.asarray(feats), jnp.asarray(new_feats),
        )
        np.testing.assert_array_equal(np.asarray(a_cnt), np.asarray(w_cnt))
        np.testing.assert_array_equal(
            np.sort(np.asarray(a_idx), axis=-1),
            np.sort(np.asarray(w_idx), axis=-1),
        )
