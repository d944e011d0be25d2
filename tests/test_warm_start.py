"""Transfer restore (reference --restore_model_path, trainer.py:161-174):
name-intersect merge of a source checkpoint into a differently-structured
target state. The stage-wise PointRCNN chain on the real CLIs is covered by
tests/test_e2e_cli.py::test_cli_pointrcnn_stagewise."""

import jax.numpy as jnp
import numpy as np

from ssd3d.train.train_step import TrainState
from ssd3d.train.trainer import CheckpointManager, merge_by_name


def test_merge_by_name_intersects_paths_and_shapes():
    dst = {
        "rpn": {"w": jnp.zeros((3, 2)), "b": jnp.zeros((2,))},
        "rcnn": {"w": jnp.zeros((4, 4))},
        "extra": {"v": jnp.zeros((5,))},
    }
    src = {
        "rpn": {"w": np.ones((3, 2)), "b": np.ones((7,))},  # b: shape mismatch
        "rcnn": {"w": np.full((4, 4), 2.0)},
        "stale": {"q": np.ones((1,))},  # not in dst: ignored
    }
    merged, copied, skipped = merge_by_name(dst, src)
    assert sorted(copied) == ["rcnn/w", "rpn/w"]
    assert sorted(skipped) == ["extra/v", "rpn/b"]
    np.testing.assert_array_equal(merged["rpn"]["w"], 1.0)
    np.testing.assert_array_equal(merged["rcnn"]["w"], 2.0)
    np.testing.assert_array_equal(merged["rpn"]["b"], 0.0)  # left at init
    np.testing.assert_array_equal(merged["extra"]["v"], 0.0)
    # dtype follows the destination leaf
    assert merged["rpn"]["w"].dtype == jnp.zeros((3, 2)).dtype


def test_restore_raw_across_structures(tmp_path):
    """A checkpoint written for one state structure restores raw and merges
    into a target whose tree differs (extra head, different optimizer)."""
    src_state = TrainState(
        step=jnp.asarray(100, jnp.int32),
        params={"rpn": {"w": jnp.full((2, 2), 3.0)}},
        batch_stats={"rpn": {"mean": jnp.full((2,), 0.5)}},
        opt_state={"mu": {"rpn": {"w": jnp.ones((2, 2))}}},
    )
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    ckpt.save(100, src_state)

    raw, step = ckpt.restore_raw()
    assert step == 100
    dst_params = {
        "rpn": {"w": jnp.zeros((2, 2))},
        "rcnn_head": {"w": jnp.zeros((3,))},  # absent from the source
    }
    merged, copied, skipped = merge_by_name(dst_params, raw["params"])
    assert copied == ["rpn/w"] and skipped == ["rcnn_head/w"]
    np.testing.assert_array_equal(merged["rpn"]["w"], 3.0)


def test_restore_from_path_accepts_all_path_shapes(tmp_path):
    """--restore_model_path accepts a run dir, the ckpt dir, a numeric step
    dir, and a copied-aside non-numeric step dir (best_ckpt)."""
    import os
    import shutil

    from ssd3d.train.trainer import restore_from_path

    run_dir = tmp_path / "run"
    state = TrainState(
        step=jnp.asarray(40, jnp.int32),
        params={"rpn": {"w": jnp.full((2, 2), 7.0)}},
        batch_stats={},
        opt_state={},
    )
    ckpt = CheckpointManager(str(run_dir / "ckpt"))
    ckpt.save(40, state)
    shutil.copytree(str(run_dir / "ckpt" / "40"), str(run_dir / "best_ckpt"))

    for path in (run_dir, run_dir / "ckpt", run_dir / "ckpt" / "40",
                 run_dir / "best_ckpt"):
        raw, step = restore_from_path(str(path))
        assert step == 40, path
        np.testing.assert_array_equal(raw["params"]["rpn"]["w"], 7.0)
        # typed restore through a template
        restored, step = restore_from_path(str(path), template=state)
        assert step == 40 and int(restored.step) == 40
        np.testing.assert_array_equal(restored.params["rpn"]["w"], 7.0)

    try:
        restore_from_path(str(tmp_path / "nope"))
    except FileNotFoundError:
        pass
    else:
        raise AssertionError("missing path must raise")


def test_checkpoint_manager_daemon_refresh(tmp_path):
    """A manager constructed BEFORE checkpoints exist must see later saves
    with all_steps(refresh=True) — the evaluator daemon polls a live run
    this way (orbax caches the listing at construction; the round-5
    endurance run caught the daemon idling forever without the reload)."""
    import jax.numpy as jnp

    from ssd3d.train.trainer import CheckpointManager

    d = str(tmp_path / "ckpt")
    watcher = CheckpointManager(d)  # daemon's view, empty dir
    assert watcher.all_steps() == []

    writer = CheckpointManager(d)  # trainer's view
    writer.save(10, {"w": jnp.zeros((2,))})
    writer.mngr.wait_until_finished()

    assert 10 in watcher.all_steps(refresh=True)
