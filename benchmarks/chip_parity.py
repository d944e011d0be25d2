"""On-hardware parity audit for the ops that CPU tests cannot cover.

The TPU MXU's default matmul precision truncates f32 operands to bf16 —
integer-valued operands above 256 (prefix sums, packed bitmask words) get
rounded, which corrupts index selection while every CPU test stays green.
This script drives the public ops at flagship scale (n=16384) on the real
chip against numpy oracles. Run it after touching ssd3d/ops/grouping.py,
ssd3d/ops/pallas/*, or ssd3d/core/geometry.py:

    PYTHONPATH=. python benchmarks/chip_parity.py

Historical catch: before `_select_from_words` pinned its one-hot fetches to
Precision.HIGHEST, 4/4096 ball-query rows came back with wrong neighbors on
v5e — invisible on CPU.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from ssd3d.ops.grouping import ball_query, ball_query_multi, group_points
from ssd3d.ops.sampling import farthest_point_sample
from ssd3d.core.geometry import boxes_to_corners


def oracle_ball(xyz, q, lo, hi, ns, self_inc):
    d2 = ((q[:, None] - xyz[None]) ** 2).sum(-1)
    valid = (d2 >= lo * lo) & (d2 < hi * hi)
    if self_inc:
        valid |= d2 == 0
    idx = np.zeros((q.shape[0], ns), np.int32)
    cnt = np.zeros((q.shape[0],), np.int32)
    for i in range(q.shape[0]):
        hits = np.nonzero(valid[i])[0][:ns]
        cnt[i] = len(hits)
        if len(hits):
            idx[i, : len(hits)] = hits
            idx[i, len(hits):] = hits[0]
    return idx, cnt


def main():
    failures = 0
    rng = np.random.RandomState(0)
    n, m = 16384, 4096
    xyz = rng.uniform(-1, 1, (1, n, 3)).astype(np.float32) * np.array(
        [40, 2, 35], np.float32
    )
    xyz[..., 2] += 35.0
    new_xyz = xyz[:, :m]
    jxyz, jnew = jnp.asarray(xyz), jnp.asarray(new_xyz)

    # plain ball query through the packed-selection path
    idx, cnt = jax.jit(lambda a, b: ball_query(0.8, 64, a, b))(jxyz, jnew)
    widx, wcnt = oracle_ball(xyz[0], new_xyz[0], 0.0, 0.8, 64, False)
    bad = int(
        ((np.asarray(idx)[0] != widx).any(1) | (np.asarray(cnt)[0] != wcnt)).sum()
    )
    print(f"ball_query n={n}: {bad}/{m} rows wrong")
    failures += bad

    # dilated multi-ring (Pallas ring-words path when n % 2048 == 0)
    outs = jax.jit(
        lambda a, b: ball_query_multi((0.2, 0.4, 0.8), (32, 32, 64), a, b,
                                      dilated=True)
    )(jxyz, jnew)
    rings = [(0.0, 0.2, 32, False), (0.2, 0.4, 32, True), (0.4, 0.8, 64, True)]
    for k, (lo, hi, ns, si) in enumerate(rings):
        gi, gc = np.asarray(outs[k][0])[0], np.asarray(outs[k][1])[0]
        wi, wc = oracle_ball(xyz[0], new_xyz[0], lo, hi, ns, si)
        bad = int(((gi != wi).any(1) | (gc != wc)).sum())
        print(f"ball_query_multi ring{k}: {bad}/{m} rows wrong")
        failures += bad

    # Pallas gather (narrow f32 + bf16, plus the two-lane-tile c=131
    # layer-3 packed shape) vs take_along_axis
    for b, gn, c, dt in [(8, n, 4, jnp.float32), (16, n, 4, jnp.float32),
                         (2, n, 6, jnp.bfloat16), (8, 1024, 131, jnp.float32)]:
        src = jnp.asarray(rng.randn(b, gn, c).astype(np.float32)).astype(dt)
        gidx = jnp.asarray(rng.randint(0, gn, (b, 512, 32)).astype(np.int32))
        got = np.asarray(jax.jit(group_points)(src, gidx).astype(jnp.float32))
        want = np.asarray(
            jnp.take_along_axis(
                src, gidx.reshape(b, -1)[..., None], axis=1
            ).astype(jnp.float32)
        ).reshape(b, 512, 32, c)
        ok = np.array_equal(got, want)
        print(f"group_points b={b} n={gn} c={c} {np.dtype(dt).name}: exact={ok}")
        failures += 0 if ok else 1

    # fused SA kernel (gather + center + MLP + maxpool) vs jnp replica at
    # the layer-1/2 shapes; tolerance = bf16 ulps (fusion-order differences)
    from ssd3d.ops.pallas.sa_fused import sa_fused_pallas

    for fb, fn, fcf, fm, fns in [(2, 16384, 1, 4096, 32), (2, 4096, 64, 1024, 64)]:
        src = jnp.asarray(rng.randn(fb, fn, fcf + 3).astype(np.float32))
        gidx = jnp.asarray(rng.randint(0, fn, (fb, fm, fns)).astype(np.int32))
        ctrs = jnp.asarray(rng.randn(fb, fm, 3).astype(np.float32))
        layers, c = [], fcf + 3
        for ch in (16, 16, 32):
            layers.append(
                (jnp.asarray(rng.randn(c, ch).astype(np.float32) * 0.3),
                 jnp.asarray(rng.randn(ch).astype(np.float32) * 0.1),
                 jnp.asarray(np.abs(rng.randn(ch)).astype(np.float32)),
                 jnp.asarray(rng.randn(ch).astype(np.float32) * 0.1)))
            c = ch
        got = np.asarray(sa_fused_pallas(src, gidx, ctrs, layers))

        def ref_sa(src, gidx, ctrs, layers):
            g = jnp.take_along_axis(
                src, gidx.reshape(fb, -1)[..., None], axis=1
            ).reshape(fb, fm, fns, -1)
            x = jnp.concatenate(
                [g[..., :fcf], g[..., fcf:] - ctrs[:, :, None, :]], -1)
            for (w, bb, inv, shift) in layers:
                y = jnp.dot(
                    x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16) + bb.astype(jnp.bfloat16)
                x = jnp.maximum(y.astype(jnp.float32) * inv + shift, 0.0)
            return jnp.max(x, axis=2)

        want = np.asarray(jax.jit(ref_sa)(src, gidx, ctrs, layers))
        derr = np.abs(got - want).max()
        print(f"sa_fused n={fn} cf={fcf} ns={fns}: max abs diff {derr:.4f}")
        failures += 0 if derr < 0.05 else 1

    # F-FPS Pallas kernel vs the jnp while-loop reference, exact idx match
    from ssd3d.ops.sampling import farthest_point_sample_from_dist
    from ssd3d.core.geometry import square_distance

    for fb, fn, fm in [(8, 1024, 512), (8, 512, 256), (3, 1024, 512)]:
        feats = jnp.asarray(rng.randn(fb, fn, 64).astype(np.float32))
        dmat = jax.jit(square_distance)(feats, feats)
        got = np.asarray(
            jax.jit(lambda d: farthest_point_sample_from_dist(d, fm))(dmat)
        )
        want = np.asarray(
            jax.jit(
                lambda d: farthest_point_sample_from_dist(d, fm, False)
            )(dmat)
        )
        ok = np.array_equal(got, want)
        uniq = min(len(np.unique(got[i])) for i in range(fb))
        print(f"ffps b={fb} n={fn} m={fm}: exact={ok} min_unique={uniq}/{fm}")
        failures += 0 if (ok and uniq == fm) else 1

    # D-FPS uniqueness (duplicate picks = distance-precision regression)
    fps = np.asarray(jax.jit(lambda a: farthest_point_sample(a, 512))(jxyz))[0]
    uniq = len(np.unique(fps))
    print(f"fps unique picks: {uniq}/512")
    failures += 0 if uniq == 512 else 1

    # corner rotation precision
    boxes = np.concatenate(
        [rng.uniform(-35, 35, (512, 1)), rng.uniform(0, 3, (512, 1)),
         rng.uniform(5, 70, (512, 1)), rng.uniform(1, 5, (512, 3)),
         rng.uniform(-np.pi, np.pi, (512, 1))], axis=1,
    ).astype(np.float32)
    corners = np.asarray(jax.jit(boxes_to_corners)(jnp.asarray(boxes)))
    c_, s_ = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    l, h, w = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    xs = np.stack([l / 2, l / 2, -l / 2, -l / 2] * 2, 1)
    zs = np.stack([w / 2, -w / 2, -w / 2, w / 2] * 2, 1)
    wx = c_[:, None] * xs + s_[:, None] * zs + boxes[:, None, 0]
    wz = -s_[:, None] * xs + c_[:, None] * zs + boxes[:, None, 2]
    err = max(np.abs(corners[..., 0] - wx).max(),
              np.abs(corners[..., 2] - wz).max())
    print(f"corner rotation max abs err: {err:.2e} m")
    failures += 0 if err < 1e-3 else 1

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    sys.exit(0 if failures == 0 else 1)


if __name__ == "__main__":
    main()
