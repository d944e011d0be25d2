"""Compare gather strategies at 3DSSD layer-1 scale on TPU.

take_along_axis row gathers are element-rate-limited (~10 ns/elem measured);
candidates: packed channels (fewer, wider rows), two-stage one-hot matmul
(block gather on the MXU), and bf16.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

B, N, M, NS = 8, 16384, 4096, 128  # all three scales fused: 32+32+64
C = 4

rng = np.random.RandomState(0)
src = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
idx = jnp.asarray(rng.randint(0, N, (B, M * NS)).astype(np.int32))


def fetch(out):
    return float(jnp.sum(out[0] if isinstance(out, tuple) else out))


def timeit(name, fn, *args, iters=3):
    fn_j = jax.jit(fn)
    fetch(fn_j(*args))
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        acc += fetch(fn_j(args[0] + jnp.float32(i) * 1e-6, *args[1:]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1000:9.2f} ms", flush=True)


def take_along(src, idx):
    return jnp.take_along_axis(src, idx[..., None], axis=1)


def onehot_block(src, idx, block=32, dtype=jnp.float32):
    b, n, c = src.shape
    nb = n // block
    blk = idx // block
    off = idx % block
    oh = jax.nn.one_hot(blk, nb, dtype=dtype)  # [b, rows, nb]
    tmp = jnp.einsum("brn,bnk->brk", oh, src.reshape(b, nb, block * c).astype(dtype),
                     preferred_element_type=jnp.float32)
    tmp = tmp.reshape(b, idx.shape[1], block, c)
    oh2 = jax.nn.one_hot(off, block, dtype=jnp.float32)
    return jnp.einsum("brj,brjc->brc", oh2, tmp)


def onehot_block_chunked(src, idx, block=32, chunk=65536, dtype=jnp.bfloat16):
    b, n, c = src.shape
    rows = idx.shape[1]
    nb = n // block
    src_r = src.reshape(b, nb, block * c).astype(dtype)

    def one(i_chunk):
        blk = i_chunk // block
        off = i_chunk % block
        oh = jax.nn.one_hot(blk, nb, dtype=dtype)
        tmp = jnp.einsum("brn,bnk->brk", oh, src_r,
                         preferred_element_type=jnp.float32)
        tmp = tmp.reshape(b, chunk, block, c)
        oh2 = jax.nn.one_hot(off, block, dtype=jnp.float32)
        return jnp.einsum("brj,brjc->brc", oh2, tmp)

    parts = [one(idx[:, s:s + chunk]) for s in range(0, rows, chunk)]
    return jnp.concatenate(parts, axis=1)


timeit("take_along_axis f32 [8,512k,4]", take_along, src, idx)
timeit("take_along_axis bf16", lambda s, i: take_along(s.astype(jnp.bfloat16), i), src, idx)
timeit("take_along packed x2 (8ch)",
       lambda s, i: take_along(jnp.concatenate([s, s], -1), i), src, idx)
timeit("onehot-block bf16 chunked", partial(onehot_block_chunked), src, idx)
# smaller row count (single scale ns=32)
idx32 = idx[:, : M * 32]
timeit("take_along single scale (128k rows)", take_along, src, idx32)
print("done")


def gather_via_u16(src, idx):
    """Exact f32 gather at 16-bit gather speed: bitcast to uint16 pairs."""
    b, n, c = src.shape
    u16 = jax.lax.bitcast_convert_type(src, jnp.uint16)  # [b, n, c, 2]
    u16 = u16.reshape(b, n, c * 2)
    out = jnp.take_along_axis(u16, idx[..., None], axis=1)
    return jax.lax.bitcast_convert_type(
        out.reshape(b, idx.shape[1], c, 2), jnp.float32
    )


if __name__ == "__main__" and "--extra" in sys.argv:
    timeit("u16-bitcast exact f32 gather", gather_via_u16, src, idx)
    # clustered indices (ball-query-like): sorted + repeated
    idx_c = jnp.sort(idx, axis=1)
    timeit("take_along f32 clustered", lambda s, i: take_along(s, i), src, idx_c)
    timeit("u16 gather clustered", gather_via_u16, src, idx_c)
    v = gather_via_u16(src, idx)
    w = take_along(src, idx)
    print("exactness:", bool(jnp.all(v == w)))
