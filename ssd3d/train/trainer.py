"""Training runtime: data-parallel jit train step + orbax checkpoints +
metrics logging. Replaces the reference trainer (lib/core/trainer.py) —
per-GPU towers, feed_dicts, tf.train.Saver — with one pjit-sharded program
and a deterministic input pipeline.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssd3d.data import build_loader
from ssd3d.models.api import build_pipeline
from ssd3d.parallel import batch_sharding, make_mesh, replicated
from ssd3d.train.train_step import TrainState


class CheckpointManager:
    """Orbax-backed save/restore with max-to-keep (reference keeps 10,
    config.py:121-123) and best-checkpoint promotion (evaluator.py:119)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 10):
        import orbax.checkpoint as ocp

        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state):
        import orbax.checkpoint as ocp

        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def restore(self, state_like, step: int | None = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None, None
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )
        return restored, step

    def restore_raw(self, step: int | None = None):
        """Restore as a raw nested dict (no structure template).

        Used for cross-run transfer restore, where the source run's state
        structure (model variant, optimizer) may differ from this run's."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None, None
        restored = self.mngr.restore(step, args=ocp.args.StandardRestore())
        return restored, step

    def latest_step(self):
        return self.mngr.latest_step()

    def all_steps(self, refresh: bool = False):
        """refresh=True re-reads the directory — orbax caches the step
        listing at construction, so a DAEMON polling a live run (the
        reference evaluator pattern, evaluator.py:94-110) must reload or
        it never sees checkpoints written after it started. Caught by the
        round-5 endurance run: the concurrent evaluator idled forever."""
        if refresh:
            self.mngr.reload()
        return list(self.mngr.all_steps())


def restore_from_path(path: str, template=None, step: int | None = None):
    """Restore a checkpoint from any path shape users pass as
    `--restore_model_path` (the reference evaluator/tester/trainer CLIs,
    evaluator.py:21 / tester.py:21 / trainer.py:27): a run dir (containing
    ckpt/), an orbax manager dir (numeric step subdirs), or a single copied
    step dir (e.g. the evaluator's best_ckpt). With `template=None` the raw
    nested dict comes back; with a state template, the typed state.
    Returns (state_or_raw, step)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"restore_model_path {path!r} not found")
    if os.path.isdir(os.path.join(path, "ckpt")):
        path = os.path.join(path, "ckpt")
    if any(d.isdigit() for d in os.listdir(path)):
        mngr = CheckpointManager(path)
        if template is not None:
            return mngr.restore(template, step)
        return mngr.restore_raw(step)
    if not os.path.isdir(os.path.join(path, "default")):
        raise FileNotFoundError(
            f"{path!r} is neither a run dir, a checkpoint dir, nor a saved "
            "step directory"
        )
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    if template is not None:
        restored = ckptr.restore(
            os.path.join(path, "default"),
            args=ocp.args.StandardRestore(template),
        )
    else:
        restored = ckptr.restore(os.path.join(path, "default"))
    base = os.path.basename(path)
    if base.isdigit():
        found_step = int(base)
    else:
        raw_step = (restored.get("step") if isinstance(restored, dict)
                    else getattr(restored, "step", None))
        found_step = int(raw_step) if raw_step is not None else None
    return restored, found_step


def merge_by_name(dst, src, prefix=""):
    """Copy leaves of `src` into `dst` wherever path AND shape match.

    The reference's transfer restore intersects checkpoint variable names
    with graph variables and skips everything else (trainer.py:161-174,
    get_variables_in_checkpoint_file trainer_utils.py:48-54) — this is the
    pytree equivalent. Returns (merged, copied_paths, skipped_paths);
    `skipped` lists dst leaves the source did not provide (or provided with
    a different shape)."""
    copied, skipped = [], []

    def go(d, s, pre):
        if not isinstance(d, dict):
            raise TypeError(f"expected dict at {pre!r}, got {type(d)}")
        out = {}
        for k, v in d.items():
            path = f"{pre}/{k}" if pre else k
            sv = s.get(k) if isinstance(s, dict) else None
            if isinstance(v, dict):
                out[k] = go(v, sv if isinstance(sv, dict) else {}, path)
            elif (
                sv is not None
                and not isinstance(sv, dict)
                and tuple(np.shape(sv)) == tuple(np.shape(v))
            ):
                out[k] = jnp.asarray(sv, jnp.asarray(v).dtype)
                copied.append(path)
            else:
                out[k] = v
                skipped.append(path)
        return out

    return go(dst, src, prefix), copied, skipped


class Trainer:
    """End-to-end KITTI training (the reference trainer.py CLI body)."""

    def __init__(self, cfg, log_dir: str, split: str = "train", seed: int = 0,
                 restore_model_path: str | None = None,
                 restore_tf_checkpoint: str | None = None):
        self.cfg = cfg
        self.log_dir = os.path.abspath(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        # multi-host: every process runs the identical program over the
        # global mesh, but only process 0 owns the run-dir text artifacts
        # (checkpoint saves stay collective — orbax coordinates them)
        self.is_lead = jax.process_index() == 0
        devnull = open(os.devnull, "w")
        self.log_file = (
            open(os.path.join(self.log_dir, "log_train.txt"), "a")
            if self.is_lead else devnull
        )
        self.metrics_file = (
            open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
            if self.is_lead else devnull
        )
        if self.is_lead:
            # config snapshot into the run dir (trainer.py:59)
            with open(os.path.join(self.log_dir, "config_snapshot.json"),
                      "w") as f:
                json.dump(cfg.to_dict(), f, indent=1, default=str)

        self.pipeline = build_pipeline(cfg, nms_pre_topk=cfg.TPU.NMS_PRE_TOPK or 2048)
        self.model = self.pipeline.model
        self.graph = self.pipeline.graph
        self.loader = build_loader(
            cfg, split, training=True, seed=seed,
            device_aug=cfg.TPU.DEVICE_AUGMENT,
        )

        n_dev = len(jax.devices())
        self.mesh = make_mesh(n_dev)
        self.bsh = batch_sharding(self.mesh)
        self.rep = replicated(self.mesh)
        self.batch_size = cfg.TRAIN.CONFIG.BATCH_SIZE * cfg.TRAIN.CONFIG.GPU_NUM
        if self.batch_size % n_dev != 0:
            self.batch_size = max(n_dev, self.batch_size - self.batch_size % n_dev)
            self.log(f"batch size adjusted to {self.batch_size} for {n_dev} devices")

        if jax.process_count() > 1:
            # per-host input sharding: this process loads only the global-
            # batch rows its addressable devices own (the loader is
            # (seed, epoch, index)-pure, so every host slices the identical
            # deterministic batch). Falls back to full-batch loading when
            # the host's rows aren't one contiguous run.
            idx_map = self.bsh.addressable_devices_indices_map(
                (self.batch_size,)
            )
            rows = sorted(
                (s[0].start or 0,
                 self.batch_size if s[0].stop is None else s[0].stop)
                for s in idx_map.values()
            )
            lo, hi = rows[0][0], rows[-1][1]
            contiguous = all(
                a[1] == b[0] for a, b in zip(rows, rows[1:])
            ) and (hi - lo) * jax.process_count() == self.batch_size * 1
            if contiguous:
                self.loader.row_range = (lo, hi)
                self.log(
                    f"per-host input sharding: rows [{lo}, {hi}) of "
                    f"{self.batch_size}"
                )
            else:
                self.log(
                    "per-host input sharding: full-batch fallback "
                    f"(non-contiguous rows {rows})"
                )

        self.ckpt = CheckpointManager(
            os.path.join(self.log_dir, "ckpt"),
            cfg.TRAIN.CONFIG.MAX_CHECKPOINTS_TO_KEEP,
        )
        self.restore_model_path = restore_model_path
        self.restore_tf_checkpoint = restore_tf_checkpoint
        self.seed = seed

        batch_keys = ["points", "gt_boxes", "gt_labels"]
        if cfg.DATASET.TYPE.upper() == "NUSCENES":
            batch_keys += ["gt_velocity", "gt_attribute"]
        if (cfg.TPU.DEVICE_AUGMENT and cfg.TRAIN.AUGMENTATIONS.OPEN
                and cfg.DATASET.TYPE.upper() == "KITTI"):
            batch_keys += ["plane"]
            if cfg.TRAIN.AUGMENTATIONS.MIXUP.OPEN:
                batch_keys += ["cand_points", "cand_boxes", "cand_labels",
                               "cand_valid"]
        self.batch_keys = tuple(batch_keys)
        # state shardings depend on PARALLEL_MODE: 'dp' replicates, 'fsdp'
        # shards params + optimizer moments across the data axis (the
        # sharding tree needs the state structure, so the step is jitted
        # once the state exists — see init_or_restore)
        self.parallel_mode = cfg.TPU.PARALLEL_MODE
        self.state_sh = self.rep
        self.step_fn = None

    def _build_step_fn(self, state):
        if self.parallel_mode == "fsdp":
            from ssd3d.parallel import fsdp_shardings

            self.state_sh = fsdp_shardings(state, self.mesh)
        elif self.parallel_mode != "dp":
            raise ValueError(
                f"unknown TPU.PARALLEL_MODE {self.parallel_mode!r}"
            )
        self.step_fn = jax.jit(
            self.graph.train_step,
            in_shardings=(self.state_sh,
                          {k: self.bsh for k in self.batch_keys}, self.rep),
            out_shardings=(self.state_sh, self.rep),
            donate_argnums=(0,),
        )

    def log(self, msg: str):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        self.log_file.write(line + "\n")
        self.log_file.flush()

    def _device_batch(self, batch):
        if jax.process_count() > 1:
            from ssd3d.parallel import make_global_batch

            # identical deterministic batch on every host; each process
            # feeds the rows its addressable devices own
            return make_global_batch(
                self.bsh, {k: batch[k] for k in self.batch_keys}
            )
        return {
            k: jax.device_put(jnp.asarray(batch[k]), self.bsh)
            for k in self.batch_keys
        }

    def init_or_restore(self) -> TrainState:
        example = jnp.zeros(
            (1, *self.loader.sample_points_shape), jnp.float32
        )
        state = self.graph.init_state(jax.random.PRNGKey(self.seed), example)
        self._build_step_fn(state)
        state = jax.device_put(state, self.state_sh)
        restored, step = self.ckpt.restore(state)
        if restored is not None:
            self.log(f"restored checkpoint at step {step}")
            return jax.device_put(restored, self.state_sh)
        if self.restore_model_path:
            state = self._warm_start(state, self.restore_model_path)
            state = jax.device_put(state, self.state_sh)
        if self.restore_tf_checkpoint:
            from ssd3d.utils.tf_checkpoint import convert_tf_checkpoint

            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            new_vars, missing = convert_tf_checkpoint(
                self.restore_tf_checkpoint, self.cfg, variables, log=self.log
            )
            self.log(
                f"TF checkpoint {self.restore_tf_checkpoint} converted "
                f"({len(missing)} unmatched paths)"
            )
            state = state.replace(params=new_vars["params"],
                                  batch_stats=new_vars["batch_stats"])
            state = jax.device_put(state, self.state_sh)
        return state

    def _warm_start(self, state: TrainState, path: str) -> TrainState:
        """Transfer restore from another run (reference --restore_model_path,
        trainer.py:161-174): copy params/batch_stats whose names and shapes
        intersect, keep fresh step and optimizer state. Used for PointRCNN
        stage-wise training (stage-2 starts from stage-1 weights,
        tiny_pointrcnn_stage2.yaml:26-27 in the reference)."""
        raw, step = restore_from_path(path)
        if raw is None:
            raise FileNotFoundError(f"no checkpoint under {path!r}")
        params, copied_p, skipped_p = merge_by_name(
            state.params, raw.get("params", {})
        )
        stats, copied_s, skipped_s = merge_by_name(
            state.batch_stats, raw.get("batch_stats", {})
        )
        skipped = skipped_p + skipped_s
        self.log(
            f"warm start from {path} (step {step}): "
            f"{len(copied_p) + len(copied_s)} tensors restored, "
            f"{len(skipped)} left at init"
            + (f" (e.g. {skipped[0]})" if skipped else "")
        )
        return state.replace(params=params, batch_stats=stats)

    def train(self, max_iterations: int | None = None):
        cfg = self.cfg.TRAIN.CONFIG
        max_iters = max_iterations or cfg.MAX_ITERATIONS
        state = self.init_or_restore()
        start_step = int(state.step)
        rng = jax.random.PRNGKey(self.seed + 1)

        num_procs = self.cfg.DATA_LOADER.NUM_PROCS
        if num_procs < 0:  # auto: processes only when the host runs the
            # augmentation chain (measured faster: benchmarks/bench_loader.py)
            num_procs = 4 if self.loader.augmentor is not None else 0
        t_last = time.time()
        it = start_step
        batch_gen = self.loader.batches(
            self.batch_size,
            num_threads=self.cfg.DATA_LOADER.NUM_THREADS,
            num_procs=num_procs,
            # resume is batch-exact: fast-forward the pure index stream to
            # the restored step so the data sequence continues as if the
            # run had never been killed
            start_iter=start_step,
        )
        for batch in batch_gen:
            if it >= max_iters:
                break
            state, metrics = self.step_fn(state, self._device_batch(batch), rng)
            it += 1
            if it % cfg.SUMMARY_INTERVAL == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = (time.time() - t_last) / cfg.SUMMARY_INTERVAL
                t_last = time.time()
                self.log(
                    f"iter {it}/{max_iters} "
                    + " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
                    + f" ({dt:.3f}s/it)"
                )
                self.metrics_file.write(
                    json.dumps({"iter": it, "sec_per_it": dt, **metrics}) + "\n"
                )
                self.metrics_file.flush()
            if it % cfg.CHECKPOINT_INTERVAL == 0:
                self.ckpt.save(it, self._host_state(state))
                self.log(f"saved checkpoint at iter {it}")
                if cfg.SUMMARY_BEV_IMAGES and self.is_lead:
                    # PNG stand-in for the reference's TF BEV image summary
                    # + a 3D render/interactive HTML pair standing in for
                    # the mayavi viewer (viz_util.py:39,111)
                    from ssd3d.utils.viz import (draw_bev, draw_scene_3d,
                                                 dump_scene_html)

                    bev_dir = os.path.join(self.log_dir, "bev")
                    s3d_dir = os.path.join(self.log_dir, "scene3d")
                    os.makedirs(bev_dir, exist_ok=True)
                    os.makedirs(s3d_dir, exist_ok=True)
                    gt = batch["gt_boxes"][0]
                    gt = gt[np.any(gt != 0, axis=-1)]
                    pts = np.asarray(batch["points"][0])
                    draw_bev(
                        pts,
                        os.path.join(bev_dir, f"iter_{it:07d}.png"),
                        gt_boxes=gt,
                    )
                    draw_scene_3d(
                        pts,
                        os.path.join(s3d_dir, f"iter_{it:07d}.png"),
                        gt_boxes=gt,
                    )
                    dump_scene_html(
                        pts,
                        os.path.join(s3d_dir, f"iter_{it:07d}.html"),
                        gt_boxes=gt,
                    )
        # tear the worker pool down NOW (generator close runs its finally)
        # instead of at interpreter shutdown, where multiprocessing's
        # exit-time join can deadlock against jax.distributed teardown
        batch_gen.close()
        self.ckpt.save(it, self._host_state(state))
        self.log(f"training done at iter {it}")
        return state

    def _host_state(self, state):
        """Fully-addressable host copy of the train state for checkpointing.
        Under fsdp x multi-process, state leaves span non-addressable
        devices and device_get alone fails — all-gather them first."""
        if jax.process_count() > 1 and self.parallel_mode == "fsdp":
            from jax.experimental import multihost_utils

            # tiled=True: global non-fully-addressable arrays are
            # reassembled into their global value (tiled=False stacks a
            # process axis and REJECTS global arrays — this path raised
            # "only supports tiled=True" whenever an fsdp multi-process
            # run tried to checkpoint; caught by the slow-tier
            # test_two_process_fsdp_matches_single_process)
            return multihost_utils.process_allgather(state, tiled=True)
        return jax.device_get(state)
