"""Pallas kernels vs jnp references, in interpreter mode on CPU (the real-TPU
paths are exercised by bench.py / the driver)."""

import functools
from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas


@pytest.fixture()
def interpret():
    orig = pallas.pallas_call
    with mock.patch.object(
        pallas, "pallas_call", functools.partial(orig, interpret=True)
    ):
        yield


def test_fps_batch_kernel_matches_reference(interpret, rng):
    import importlib

    import ssd3d.ops.pallas.fps as f

    importlib.reload(f)
    from ssd3d.ops.sampling import _fps_reference

    xyz = jnp.asarray(rng.randn(5, 256, 3).astype(np.float32))
    want = np.asarray(_fps_reference(xyz, 64))
    got = np.asarray(f._fps_pallas_batch(xyz, 64))
    np.testing.assert_array_equal(got, want)
    got_tiled = np.asarray(f._fps_pallas_tiled(xyz, 64))
    np.testing.assert_array_equal(got_tiled, want)


def test_ffps_hbm_kernel_matches_reference(interpret, rng):
    """The HBM-streamed F-FPS (rows DMA'd per pick) against the jnp loop —
    small shapes here; on chip it serves matrices too big for VMEM."""
    import importlib

    import ssd3d.ops.pallas.fps as f

    importlib.reload(f)
    from ssd3d.core.geometry import square_distance
    from ssd3d.ops.sampling import farthest_point_sample_from_dist

    feats = jnp.asarray(rng.randn(3, 1024, 6).astype(np.float32))
    dist = square_distance(feats, feats)
    want = np.asarray(
        farthest_point_sample_from_dist(dist, 32, use_pallas=False)
    )
    got = np.asarray(f.ffps_pallas_hbm(dist, 32))
    np.testing.assert_array_equal(got, want)
    # VMEM-resident variant agrees too
    got_vmem = np.asarray(f.ffps_pallas(dist, 32))
    np.testing.assert_array_equal(got_vmem, want)


def test_ffps_pre_tiled_matrix_matches(interpret, rng):
    """The pre-tiled einsum path (farthest_point_sample_features builds the
    matrix directly in the kernels' [b, n, 8, n/8] shape to avoid the
    bitcast layout copy) must agree with the [b, n, n] matrix path."""
    import importlib

    import ssd3d.ops.pallas.fps as f

    importlib.reload(f)
    from ssd3d.core.geometry import square_distance
    from ssd3d.ops.sampling import farthest_point_sample_from_dist

    feats = jnp.asarray(rng.randn(3, 128, 6).astype(np.float32))
    dist = square_distance(feats, feats)
    want = np.asarray(
        farthest_point_sample_from_dist(dist, 32, use_pallas=False)
    )
    b, n, c = feats.shape
    cols = n // 8
    ft = feats.reshape(b, 8, cols, c)
    cross = jnp.einsum("bnc,bskc->bsnk", feats, ft,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    sq = jnp.sum(feats * feats, axis=-1)
    mat = (sq[:, None, :, None] + sq.reshape(b, 8, cols)[:, :, None, :]
           - 2.0 * cross)
    # the tiled matrix IS the s-major transpose of the square one
    np.testing.assert_allclose(
        np.asarray(mat),
        np.asarray(dist).reshape(b, n, 8, cols).transpose(0, 2, 1, 3),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(f.ffps_pallas_pre(mat, 32)), want)

    # the HBM variant takes the square matrix verbatim (row-major,
    # target axis minor — the copy-free dot layout) and DMAs the picked
    # point's contiguous row each iteration
    feats2 = jnp.asarray(rng.randn(2, 1024, 4).astype(np.float32))
    dist2 = square_distance(feats2, feats2)
    want2 = np.asarray(
        farthest_point_sample_from_dist(dist2, 16, use_pallas=False)
    )
    np.testing.assert_array_equal(
        np.asarray(f.ffps_pallas_hbm_rows(dist2, 16)), want2
    )


def test_ring_words_kernel_slabbed_matches_unslabbed(interpret, rng,
                                                     monkeypatch):
    """The n-axis slab path (used when n > _NCHUNK, e.g. nuScenes 65536)
    must produce identical words/counts to the single-slab path."""
    import importlib

    import ssd3d.ops.pallas.ring_words as rw

    importlib.reload(rw)
    xyz = jnp.asarray(rng.uniform(-3, 3, (2, 4096, 3)).astype(np.float32))
    new_xyz = xyz[:, :256]
    rings = ((0.0, 0.16, False), (0.16, 0.64, True))
    want_w, want_c = rw.ring_words_pallas(xyz, new_xyz, rings)
    monkeypatch.setattr(rw, "_NCHUNK", rw._NB)  # force 2 slabs
    got_w, got_c = rw.ring_words_pallas.__wrapped__(xyz, new_xyz, rings)
    for a, b in zip(got_w + got_c, want_w + want_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ring_words_kernel_exact(interpret, rng):
    import importlib

    import ssd3d.ops.pallas.ring_words as rw

    importlib.reload(rw)
    from ssd3d.ops.grouping import _pack_words

    xyz = jnp.asarray(rng.uniform(-3, 3, (2, 2048, 3)).astype(np.float32))
    new_xyz = xyz[:, :256]  # queries are dataset points -> exact self-dist 0
    rings = ((0.0, 0.04, False), (0.04, 0.16, True), (0.16, 0.64, True))
    words_list, cnts_list = rw.ring_words_pallas(xyz, new_xyz, rings)
    assert len(words_list) == 3 and len(cnts_list) == 3
    nbt = 2048 // rw.BLOCK
    for b in range(2):
        d2 = (
            (np.asarray(new_xyz)[b][:, None] - np.asarray(xyz)[b][None]) ** 2
        ).sum(-1)
        for k, (lo2, hi2, si) in enumerate(rings):
            words = np.asarray(words_list[k])
            cnts = np.asarray(cnts_list[k])
            # both outputs are query-trailing (the select machinery's
            # native layout): words [b, n/16, m], counts [b, n/BLOCK, m]
            assert words.shape == (2, 128, 256)
            assert cnts.shape == (2, nbt, 256)
            valid = (d2 >= lo2) & (d2 < hi2)
            if si:
                valid |= d2 == 0
            want = np.asarray(
                _pack_words(jnp.asarray(valid.reshape(256, 16, 8, 16)))
            ).reshape(256, 128)
            np.testing.assert_array_equal(words[b], want.T)
            want_cnt = valid.reshape(256, nbt, rw.BLOCK).sum(-1).T
            np.testing.assert_array_equal(cnts[b], want_cnt.astype(np.float32))


def _sa_reference(src, idx, centers, layers, cf):
    """jnp replica of the fused SA kernel's math (same dtype chain)."""
    b, m, ns = idx.shape
    g = jnp.take_along_axis(
        src, idx.reshape(b, -1)[..., None], axis=1
    ).reshape(b, m, ns, -1)
    x = jnp.concatenate(
        [g[..., :cf], g[..., cf:] - centers[:, :, None, :]], axis=-1
    )
    for (w, bb, inv, shift) in layers:
        y = jnp.dot(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bb.astype(jnp.bfloat16)
        x = jnp.maximum(y.astype(jnp.float32) * inv + shift, 0.0)
    return jnp.max(x, axis=2)


def test_sa_fused_kernel_matches_reference(interpret, rng):
    import importlib

    import ssd3d.ops.pallas.sa_fused as sf

    importlib.reload(sf)
    b, n, cf, m, ns = 2, 512, 5, 64, 16
    src = jnp.asarray(rng.randn(b, n, cf + 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, m, ns)).astype(np.int32))
    centers = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    layers = []
    c = cf + 3
    for ch in (16, 32):
        layers.append(
            (jnp.asarray(rng.randn(c, ch).astype(np.float32) * 0.3),
             jnp.asarray(rng.randn(ch).astype(np.float32) * 0.1),
             jnp.asarray(np.abs(rng.randn(ch)).astype(np.float32)),
             jnp.asarray(rng.randn(ch).astype(np.float32) * 0.1))
        )
        c = ch
    got = np.asarray(sf.sa_fused_pallas(src, idx, centers, layers))
    want = np.asarray(_sa_reference(src, idx, centers, layers, cf))
    # 1-2 bf16 ulps: XLA fuses the convert/add chain around the bf16 dots
    # differently across compilations (verified: exact with identity
    # weights/affine, ulp-level with random ones)
    np.testing.assert_allclose(got, want, rtol=0.03, atol=0.03)


def test_pointconv_fold_matches_unfused_eval(rng):
    """fold=True returns (k, b, inv, shift) whose manual application equals
    the unfused eval output, with the param tree unchanged (checkpoint
    compatibility: conv/kernel, conv/bias, bn/...)."""
    from ssd3d.nn.layers import SharedMLP

    mlp = SharedMLP((8, 12), bn=True, compute_dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(4, 6, 5).astype(np.float32))
    variables = mlp.init(jax.random.PRNGKey(0), x, True)
    assert set(variables["params"]["conv0"].keys()) == {"conv", "bn"}
    assert variables["params"]["conv0"]["conv"]["kernel"].shape == (5, 8)

    want = mlp.apply(variables, x, False)
    folded = mlp.apply(variables, x, False, fold=True)
    y = x
    for (k, bb, inv, shift) in folded:
        h = jnp.dot(
            y.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + bb.astype(jnp.bfloat16)
        y = jnp.maximum(h.astype(jnp.float32) * inv + shift, 0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gather_kernel_exact_with_vjp(interpret, rng):
    """Dynamic-slice gather kernel: forward bit-exact vs take_along_axis,
    backward = scatter-add (CUDA GroupPointGrad contract)."""
    import importlib

    import ssd3d.ops.pallas.gather as g

    importlib.reload(g)
    src = jnp.asarray(rng.randn(2, 256, 4).astype(np.float32) * 30)
    idx = jnp.asarray(rng.randint(0, 256, (2, 300)).astype(np.int32))
    got = np.asarray(g.gather_rows_pallas(src, idx))
    want = np.asarray(jnp.take_along_axis(src, idx[..., None], axis=1))
    np.testing.assert_array_equal(got, want)

    grad = np.asarray(
        jax.grad(lambda s: jnp.sum(g.gather_rows_pallas(s, idx) * 3.0))(src)
    )
    want_g = np.zeros(src.shape, np.float32)
    for b in range(2):
        for i in np.asarray(idx)[b]:
            want_g[b, i] += 3.0
    np.testing.assert_allclose(grad, want_g, atol=1e-5)


def test_three_nn_kernel_matches_reference(interpret, rng):
    """Pallas three_nn vs the jnp oracle: identical neighbor indices and
    tie order; distances to ULP tolerance (XLA's 3-element reduce may
    associate the coordinate sum differently). Padded-query path exercised
    via n not a tile multiple, m below one lane tile via m=64."""
    import importlib

    import ssd3d.ops.pallas.three_nn as t

    importlib.reload(t)
    from ssd3d.ops.interpolate import _three_nn_jnp

    for n, m in [(200, 64), (256, 96), (520, 256)]:
        unknown = jnp.asarray(rng.randn(2, n, 3).astype(np.float32) * 10)
        known = jnp.asarray(rng.randn(2, m, 3).astype(np.float32) * 10)
        want_d, want_i = _three_nn_jnp(unknown, known)
        got_d, got_i = t.three_nn_pallas(unknown, known)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(
            np.asarray(got_d), np.asarray(want_d), rtol=1e-6, atol=1e-5
        )


def test_three_nn_kernel_tie_contract(interpret):
    """Duplicate known points: slots fill in index order (CUDA scan
    contract, tf_interpolate_g.cu:24)."""
    import importlib

    import ssd3d.ops.pallas.three_nn as t

    importlib.reload(t)
    known = np.zeros((1, 64, 3), np.float32)
    known[0, :, 0] = np.arange(64) // 4  # groups of 4 identical points
    unknown = np.zeros((1, 8, 3), np.float32)
    got_d, got_i = t.three_nn_pallas(jnp.asarray(unknown), jnp.asarray(known))
    np.testing.assert_array_equal(
        np.asarray(got_i)[0, 0], np.array([0, 1, 2], np.int32)
    )
    np.testing.assert_array_equal(np.asarray(got_d)[0, 0], np.zeros(3))


def test_sa_fused_kernel_f32_mode(interpret, rng):
    """dots_bf16=False (the two-stage configs run compute_dtype f32): the
    kernel's default-precision f32 dots must match a plain f32 jnp replica
    (in interpret mode both evaluate exact f32; on TPU both lower to the
    same single-bf16-pass dot)."""
    import importlib

    import ssd3d.ops.pallas.sa_fused as sf

    importlib.reload(sf)
    b, n, cf, m, ns = 2, 512, 5, 64, 16
    src = jnp.asarray(rng.randn(b, n, cf + 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, m, ns)).astype(np.int32))
    centers = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    layers = []
    c = cf + 3
    for ch in (16, 32):
        layers.append(
            (jnp.asarray(rng.randn(c, ch).astype(np.float32) * 0.3),
             jnp.asarray(rng.randn(ch).astype(np.float32) * 0.1),
             jnp.asarray(np.abs(rng.randn(ch)).astype(np.float32)),
             jnp.asarray(rng.randn(ch).astype(np.float32) * 0.1))
        )
        c = ch
    got = np.asarray(
        sf.sa_fused_pallas(src, idx, centers, layers, dots_bf16=False)
    )

    g = jnp.take_along_axis(
        src, idx.reshape(b, -1)[..., None], axis=1
    ).reshape(b, m, ns, -1)
    x = jnp.concatenate(
        [g[..., :cf], g[..., cf:] - centers[:, :, None, :]], axis=-1
    )
    for (w, bb, inv, shift) in layers:
        y = jnp.dot(x, w) + bb
        x = jnp.maximum(y * inv + shift, 0.0)
    want = np.asarray(jnp.max(x, axis=2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
