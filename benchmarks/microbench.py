"""Per-op microbenchmarks at 3DSSD layer-1 scale on the current backend."""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ssd3d import ops
from ssd3d.ops.sampling import _fps_reference
from ssd3d.ops.grouping import ball_query_multi
from ssd3d.core.geometry import square_distance

B, N, M = 8, 16384, 4096
rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32) * 30)


def timeit(name, fn, *args, iters=3):
    """NOTE: the axon relay dedupes identical executions, so every call must
    see a fresh first argument; we perturb arg0 per iteration."""
    def call(i):
        a0 = args[0]
        if a0.dtype == jnp.float32:
            a0 = a0 + jnp.float32(i) * 1e-4
        return fn(a0, *args[1:])

    out = call(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        jax.block_until_ready(call(i + 1))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1000:9.2f} ms", flush=True)
    return out


fps_p = jax.jit(lambda x: ops.farthest_point_sample(x, M, use_pallas=True))
fps_r = jax.jit(lambda x: _fps_reference(x, M))
idx = timeit("fps pallas 16384->4096", fps_p, xyz)
timeit("fps xla-fori 16384->4096", fps_r, xyz)

new_xyz = ops.gather_points(xyz, idx)

bq = jax.jit(lambda a, b: ball_query_multi([0.2, 0.4, 0.8], [32, 32, 64], a, b, dilated=True))
res = timeit("ball_query_multi 3 scales 4096q", bq, xyz, new_xyz)

bq1 = jax.jit(lambda a, b: ops.ball_query_dilated(0.4, 0.8, 64, a, b))
timeit("ball_query single scale", bq1, xyz, new_xyz)

gidx = res[2][0]
gp = jax.jit(ops.group_points)
feats = jnp.asarray(rng.randn(B, N, 4).astype(np.float32))
timeit("group_points (8,4096,64) from 16384x4", gp, feats, gidx)

feats64 = jnp.asarray(rng.randn(B, N, 64).astype(np.float32))
timeit("group_points (8,4096,64) from 16384x64", gp, feats64, gidx)

# MLP at layer-1 scale: conv on grouped [8, 4096, 64, 68] -> 3 layers
from flax import linen as nn


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        for ch in (32, 32, 64):
            x = nn.relu(nn.Dense(ch)(x))
        return jnp.max(x, axis=2)


mlp = MLP()
grouped = jnp.asarray(rng.randn(B, M, 64, 68).astype(np.float32))
vs = mlp.init(jax.random.PRNGKey(0), grouped)
mf = jax.jit(lambda v, g: mlp.apply(v, g))
timeit("grouped MLP (8,4096,64,68)->64 + max", mf, vs, grouped)

# F-FPS distance matrix + sample at layer-2/3 scale
sub = new_xyz[:, :512]
sq = jax.jit(lambda a: square_distance(a, a))
d = timeit("square_distance 512x512", sq, sub)
ff = jax.jit(lambda d: ops.farthest_point_sample_from_dist(d, 256))
timeit("ffps 512->256", ff, d)

# NMS at head scale
bev = jnp.asarray(rng.uniform(0, 70, (256, 4)).astype(np.float32))
bev = bev.at[:, 2:].add(3.0)
sc = jnp.asarray(rng.rand(256).astype(np.float32))
nm = jax.jit(lambda b, s: ops.nms_bev(b, s, 100, 0.1))
timeit("nms_bev 256 cands", nm, bev, sc)
print("done")
