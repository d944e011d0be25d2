"""Serving export (ssd3d.bin.export): the AOT artifact round-trips through
jax.export serialize/deserialize and reproduces the live pipeline's
detections exactly — weights baked in, no framework needed on the load
side. The reference has no serving path (its tester re-runs the training
graph in a TF session, lib/core/tester.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import export as jexport

from ssd3d.bin.export import export_infer
from ssd3d.models.api import build_pipeline

from test_model import tiny_cfg


@pytest.fixture(scope="module")
def served():
    cfg = tiny_cfg()
    pipeline = build_pipeline(cfg)
    n = 512
    state = pipeline.graph.init_state(
        jax.random.PRNGKey(0), jnp.zeros((1, n, 4), jnp.float32)
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pts = np.random.RandomState(1).randn(2, n, 4).astype(np.float32) * 5
    return cfg, pipeline, variables, pts


def test_export_roundtrip_matches_live_inference(served):
    cfg, pipeline, variables, pts = served
    exported = export_infer(pipeline, variables, batch=2, n_points=512)
    restored = jexport.deserialize(exported.serialize())

    live = pipeline.infer(variables, jnp.asarray(pts))
    out = restored.call(jnp.asarray(pts))
    assert set(out) == set(live)
    for k in live:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(live[k]), err_msg=k)


@pytest.mark.slow
def test_export_symbolic_batch_serves_any_batch(served):
    cfg, pipeline, variables, pts = served
    exported = export_infer(pipeline, variables, batch=1, n_points=512,
                            symbolic_batch=True)
    restored = jexport.deserialize(exported.serialize())
    for b in (1, 3):
        x = jnp.asarray(pts[:1].repeat(b, axis=0))
        out = restored.call(x)
        assert out["boxes"].shape[0] == b
        want = pipeline.infer(variables, x)
        np.testing.assert_array_equal(np.asarray(out["boxes"]),
                                      np.asarray(want["boxes"]))
