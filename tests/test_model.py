"""Model forward: tiny config for speed + the real 3DSSD arch shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssd3d.config import load_cfg
from ssd3d.models import build_detector


def tiny_cfg():
    cfg = load_cfg()
    cfg.DATASET.KITTI.CLS_LIST = ("Car",)
    cfg.MODEL.FIRST_STAGE.REGRESSION_METHOD.TYPE = "Dist-Anchor-free"
    cfg.MODEL.FIRST_STAGE.CLS_ACTIVATION = "Sigmoid"
    cfg.MODEL.FIRST_STAGE.MAX_OUTPUT_NUM = 10
    cfg.MODEL.FIRST_STAGE.ASSIGN_METHOD = "Mask"
    cfg.MODEL.FIRST_STAGE.MINIBATCH_NUM = -1
    cfg.MODEL.FIRST_STAGE.CLASSIFICATION_LOSS.TYPE = "Center-ness"
    cfg.MODEL.NETWORK.AGGREGATION_SA_FEATURE = True
    cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE = [
        # miniature 3DSSD: SA(D-FPS) -> SA(FS) -> select(F-FPS) -> vote -> CG-SA
        [[0], [0], [0.4, 0.8], [4, 8], [[8, 8], [8, 16]], True,
         [-1], ["D-FPS"], [128], -1, False, "SA_Layer", "layer1", True, -1, 16],
        [[1], [1], [0.8, 1.6], [4, 8], [[16, 16], [16, 32]], True,
         [-1], ["FS"], [32], -1, False, "SA_Layer", "layer2", True, -1, 32],
        [[2], [2], [], [], [], True,
         [32, -1], ["F-FPS", "D-FPS"], [16, 0],
         -1, False, "SA_Layer", "vote", False, -1, 32],
        [[3], [3], -1, -1, [16], True,
         [-1], [-1], [-1], -1, -1, "Vote_Layer", "vote", False, -1, -1],
        [[2], [2], [3.2, 4.8], [4, 8], [[32, 32], [32, 64]], True,
         [-1], ["D-FPS"], [16], -1, False, "SA_Layer", "layer4", False, 4, 64],
    ]
    cfg.MODEL.NETWORK.FIRST_STAGE.HEAD = [
        [[5], [5], "conv1d", [32], True, "Det", ""]
    ]
    return cfg


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_cfg()
    model, spec = build_detector(cfg)
    pts = np.random.RandomState(0).randn(2, 512, 4).astype(np.float32) * 5
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), False)
    return cfg, model, spec, variables, pts


def test_forward_shapes(tiny_model):
    cfg, model, spec, variables, pts = tiny_model
    out = model.apply(variables, jnp.asarray(pts), False)
    n_out = 16  # vote centers
    assert out["base_xyz"].shape == (2, n_out, 3)
    assert out["cls"].shape == (2, n_out, 1)
    assert out["offset"].shape == (2, n_out, 1, 6)
    assert out["angle_cls"].shape == (2, n_out, 12)[0:2] + (1, 12)
    assert out["vote_base"][0].shape == (2, n_out, 3)
    assert out["vote_offset"][0].shape == (2, n_out, 3)


def test_decode_and_nms(tiny_model):
    cfg, model, spec, variables, pts = tiny_model
    out = model.apply(variables, jnp.asarray(pts), False)
    det = spec.decode_and_nms(out)
    assert det["boxes"].shape == (2, 10, 7)
    assert det["scores"].shape == (2, 10)
    assert bool(det["valid"].any())
    # box sizes must respect the 0.1 decode floor
    assert float(det["boxes"][..., 3:6].min()) >= 0.1 - 1e-6


def test_train_mode_updates_batch_stats(tiny_model):
    cfg, model, spec, variables, pts = tiny_model
    out, mutated = model.apply(
        variables, jnp.asarray(pts), True, 0.9, mutable=["batch_stats"]
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed


def test_forward_is_jittable_and_deterministic(tiny_model):
    cfg, model, spec, variables, pts = tiny_model
    fwd = jax.jit(lambda v, p: model.apply(v, p, False))
    a = fwd(variables, jnp.asarray(pts))
    b = fwd(variables, jnp.asarray(pts))
    np.testing.assert_array_equal(np.asarray(a["cls"]), np.asarray(b["cls"]))


@pytest.mark.slow
def test_gradients_flow(tiny_model):
    cfg, model, spec, variables, pts = tiny_model

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(pts), True, 0.9, mutable=["batch_stats"],
        )
        return jnp.sum(out["cls"] ** 2) + jnp.sum(out["offset"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in flat)
    assert nonzero > len(flat) * 0.5  # most params receive gradient


@pytest.mark.slow
def test_real_3dssd_arch_builds():
    """The shipped reference YAML builds the documented shape trace
    (SURVEY.md §3.5) — checked at reduced point count for CPU speed."""
    cfg = load_cfg("/root/reference/configs/kitti/3dssd/3dssd.yaml")
    # shrink the sampling pyramid 8x to keep CPU time sane
    arch = cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE
    arch[0][8] = [512]
    arch[1][8] = [64]
    arch[2][6] = [64, -1]
    arch[2][8] = [32, 32]
    arch[3][6] = [32, -1]
    arch[3][8] = [32, 0]
    arch[5][8] = [32]
    model, spec = build_detector(cfg)
    pts = np.random.RandomState(1).randn(1, 2048, 4).astype(np.float32) * 10
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(pts), False)
    out = model.apply(variables, jnp.asarray(pts), False)
    assert out["base_xyz"].shape == (1, 32, 3)
    assert out["cls"].shape == (1, 32, 1)
    det = spec.decode_and_nms(out)
    assert det["boxes"].shape == (1, 100, 7)


def test_fused_sa_eval_matches_unfused(tiny_model, monkeypatch):
    """Force the fused SA inference path (interpret-mode Pallas) and compare
    the full detector eval output against the unfused path — catches fused
    dispatch integration bugs (idx masking, center source, concat order)."""
    import functools
    from unittest import mock

    from jax.experimental import pallas

    from ssd3d.nn import modules as mod
    from ssd3d.ops.pallas import sa_fused

    cfg, model, spec, variables, pts = tiny_model
    want = model.apply(variables, jnp.asarray(pts), False)

    orig_call = pallas.pallas_call
    monkeypatch.setattr(
        mod.PointnetSAModuleMSG,
        "_use_fused",
        lambda self, train, src, idx: (
            not train and self.bn and not self.use_gn
            and sa_fused.supports(src, idx.shape[2], idx.shape[1])
        ),
    )
    with mock.patch.object(
        pallas, "pallas_call", functools.partial(orig_call, interpret=True)
    ):
        got = model.apply(variables, jnp.asarray(pts), False)

    for key in ("base_xyz", "cls", "offset"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), rtol=0.05, atol=0.05
        )
