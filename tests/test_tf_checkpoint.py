"""TF-1 checkpoint -> flax conversion: fabricate a reference-style checkpoint
for the tiny architecture and verify weights and BN stats land in the right
places (and that the converted model's forward actually uses them)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402
import flax  # noqa: E402

from ssd3d.models import build_detector  # noqa: E402
from ssd3d.utils.tf_checkpoint import build_name_map, convert_tf_checkpoint  # noqa: E402

from test_model import tiny_cfg  # noqa: E402


@pytest.fixture(scope="module")
def fabricated(tmp_path_factory):
    """Create a TF checkpoint with reference-style variable names whose
    values are derived from the name hash (so mismatches are detectable)."""
    cfg = tiny_cfg()
    model, spec = build_detector(cfg)
    pts = np.random.RandomState(0).randn(1, 256, 4).astype(np.float32) * 5
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), False)

    conv_map = build_name_map(cfg)
    flat = flax.traverse_util.flatten_dict(variables["params"])

    tf_dir = tmp_path_factory.mktemp("tfckpt")
    rng = np.random.RandomState(7)
    tf.compat.v1.reset_default_graph()
    with tf.compat.v1.Session() as sess:
        tf_vars = []
        expected = {}
        for path, prefix in conv_map.items():
            kkey = path + ("conv", "kernel")
            if kkey not in flat:
                continue
            in_c, out_c = flat[kkey].shape
            w = rng.randn(1, in_c, out_c).astype(np.float32)
            expected[kkey] = w.reshape(in_c, out_c)
            tf_vars.append(tf.compat.v1.get_variable(
                f"{prefix}/weights", initializer=w))
            b = rng.randn(out_c).astype(np.float32)
            expected[path + ("conv", "bias")] = b
            tf_vars.append(tf.compat.v1.get_variable(
                f"{prefix}/biases", initializer=b))
            if path + ("bn", "scale") in flat:
                for tf_name, flax_leaf in (
                    ("gamma", ("bn", "scale")), ("beta", ("bn", "bias")),
                ):
                    v = rng.randn(out_c).astype(np.float32)
                    expected[path + flax_leaf] = v
                    tf_vars.append(tf.compat.v1.get_variable(
                        f"{prefix}/bn/{tf_name}", initializer=v))
                for tf_name in ("moving_mean", "moving_variance"):
                    v = rng.rand(out_c).astype(np.float32) + 0.5
                    expected[("stats",) + path + ("bn", tf_name)] = v
                    tf_vars.append(tf.compat.v1.get_variable(
                        f"{prefix}/bn/{tf_name}", initializer=v))
        sess.run(tf.compat.v1.global_variables_initializer())
        saver = tf.compat.v1.train.Saver(tf_vars)
        ckpt_path = saver.save(sess, os.path.join(str(tf_dir), "model.ckpt"))
    return cfg, model, variables, ckpt_path, expected, pts


def test_conversion_places_all_weights(fabricated):
    cfg, model, variables, ckpt_path, expected, pts = fabricated
    new_vars, missing = convert_tf_checkpoint(ckpt_path, cfg, variables)
    assert missing == [], missing
    flat = flax.traverse_util.flatten_dict(new_vars["params"])
    stats = flax.traverse_util.flatten_dict(new_vars["batch_stats"])
    n_checked = 0
    for key, want in expected.items():
        if key[0] == "stats":
            path = key[1:-2]
            leaf = "mean" if key[-1] == "moving_mean" else "var"
            got = stats[path + ("bn", leaf)]
        else:
            got = flat[key]
        np.testing.assert_array_equal(np.asarray(got), want)
        n_checked += 1
    assert n_checked > 20


def test_converted_model_forward_differs_and_runs(fabricated):
    cfg, model, variables, ckpt_path, expected, pts = fabricated
    new_vars, _ = convert_tf_checkpoint(ckpt_path, cfg, variables)
    out_old = model.apply(variables, jnp.asarray(pts), False)
    out_new = model.apply(new_vars, jnp.asarray(pts), False)
    assert np.isfinite(np.asarray(out_new["cls"])).all()
    assert not np.allclose(
        np.asarray(out_old["cls"]), np.asarray(out_new["cls"])
    )
