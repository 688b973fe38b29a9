"""Training / evaluation runtime + CLI.

Replaces the reference's Lightning Trainer + `python -m neural_lam.train_model`
entry point (ref: neural_lam/train_model.py:27-300) with an explicit jitted
train loop:

  train_step = jit(grads + AdamW update), batch sharded over the mesh 'data'
  axis, params replicated — XLA inserts the gradient all-reduce that DDP/NCCL
  performed in the reference.

Optimizer: AdamW(lr, betas=(0.9, 0.95)) with torch's default weight decay
0.01 applied to all parameters (ref: ar_model.py:191-195). The reference
trains at constant LR with no scheduler; --lr_schedule adds optional
cosine / warmup-cosine schedules on top.
Checkpoints: `min_val_loss` (monitoring val_mean_loss) + `last`
(ref: train_model.py:264-270). Metrics go to stdout and
<run_dir>/metrics.jsonl; test artifacts (error-map csv/pdf, spatial loss
maps, example predictions) go to <run_dir>/ (reference drops these into
wandb.run.dir, ref: ar_model.py:456-696).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import random
import signal
import threading
import time
from argparse import ArgumentParser
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .checkpoint import load_checkpoint, save_checkpoint
from .config import load_config_and_datastore
from .dataset import WeatherDataModule
from .models import MODELS
from .models.ar_model import ModelArgs, jit_model_method
from .parallel import distributed as dist
from .parallel.mesh import best_data_axis, make_mesh, replicate, shard_batch


@dataclasses.dataclass
class TrainFlags:
    """Runtime flags (the non-model part of ref: train_model.py:29-209)."""

    epochs: int = 200
    batch_size: int = 4  # per-host; effective batch scales with hosts (DDP)
    ar_steps_train: int = 1
    ar_steps_eval: int = 10
    val_interval: int = 1
    seed: int = 42
    num_nodes: int = 1
    precision: str = "32"
    load: str | None = None
    restore_opt: bool = False
    eval: str | None = None  # None | "val" | "test"
    ckpt_every_steps: int = 0  # extra periodic "last" checkpoints (0 = off)
    wandb_project: str = "neural_lam_tpu"
    run_name: str = "run"
    save_dir: str = "saved_models"
    # LR schedule (beyond the reference, which trains at constant LR with
    # no scheduler): "constant" | "cosine" | "warmup_cosine"
    lr_schedule: str = "constant"
    warmup_steps: int = 1000
    decay_steps: int = 100_000
    # capture a jax.profiler trace of steps [start, start+N) into
    # <run_dir>/profile (0 = off). SURVEY.md §5: the reference has no
    # profiling story at all.
    profile_steps: int = 0
    profile_start: int = 3
    # overlap host->device batch transfer with the device step (flax-style
    # prefetch_to_device; 0 = synchronous). The reference relies on torch
    # DataLoader pin_memory+workers for the same overlap.
    prefetch_batches: int = 2


class DevicePrefetcher:
    """Iterate `place(batch)` for each loader batch, converting/placing the
    next `depth` batches on a daemon thread so host->device transfer
    overlaps the device step. Order-preserving, so results are identical
    to the synchronous loop. `close()` (idempotent) unblocks and retires
    the worker — call it when leaving the loop early."""

    def __init__(self, loader, place, depth: int = 2):
        import queue

        self._q = queue.Queue(maxsize=max(int(depth), 1))
        self._stop = threading.Event()
        self._queue_mod = queue
        self._thread = threading.Thread(
            target=self._work, args=(loader, place), daemon=True
        )
        self._thread.start()

    def _work(self, loader, place):
        try:
            for b in loader:
                item = ("item", place(b))
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except self._queue_mod.Full:
                        continue
                if self._stop.is_set():
                    return
            self._q.put(("end", None))
        except BaseException as e:  # re-raised on the consuming thread
            self._q.put(("err", e))

    def __iter__(self):
        while True:
            kind, val = self._q.get()
            if kind == "item":
                yield val
            elif kind == "err":
                raise val
            else:
                return

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except self._queue_mod.Empty:
            pass


class MetricsLogger:
    """stdout + JSONL metrics sink, with optional W&B forwarding when the
    wandb package is importable (the reference's primary sink,
    ref: train_model.py:271-275; absent in this environment)."""

    def __init__(self, run_dir: Path, use_wandb: bool = True,
                 run_name: str | None = None, config: dict | None = None,
                 rank: int = 0, val_steps=(),
                 project: str = "neural_lam_tpu"):
        self.rank = rank
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        # only rank 0 writes files / talks to wandb (multi-host runs share
        # the run_dir; ref: Lightning logs on rank 0 only)
        self._f = (open(self.run_dir / "metrics.jsonl", "a")
                   if rank == 0 else None)
        self._wandb = None
        if use_wandb and rank == 0:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, name=run_name,
                           config=config or {}, dir=str(self.run_dir))
                # summary-metric definitions (ref: utils.py:236-243)
                wandb.define_metric("val_mean_loss", summary="min")
                for step in val_steps:
                    wandb.define_metric(f"val_loss_unroll{step}",
                                        summary="min")
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: int | None = None):
        if self._f is None:
            return
        rec = {"_time": time.time()}
        if step is not None:
            rec["step"] = step
        rec.update(
            {k: (float(v) if np.ndim(v) == 0 else np.asarray(v).tolist())
             for k, v in metrics.items()}
        )
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        shown = {k: v for k, v in rec.items() if not k.startswith("_")}
        print(json.dumps(shown), flush=True)
        if self._wandb is not None:
            scalars = {k: v for k, v in rec.items()
                       if not k.startswith("_") and np.ndim(v) == 0}
            self._wandb.log(scalars, step=step)

    def log_image(self, name: str, fig):
        """Forward a matplotlib figure to W&B as an image (the reference
        logs example/error figures with wandb.Image,
        ref: ar_model.py:456-566, 420-454); no-op without wandb."""
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(fig)})


class Trainer:
    """Explicit training loop over a model + datamodule."""

    def __init__(self, model, flags: TrainFlags, run_dir=None, mesh=None,
                 eval_model=None):
        self.model = model
        # evaluation runs host-local under multi-host training; a model
        # whose predict_step is bound to the GLOBAL mesh (spatial sharding
        # + --num_nodes) needs a host-local twin for the eval paths
        self.eval_model = eval_model if eval_model is not None else model
        self.flags = flags
        self.rank = jax.process_index()
        self.run_dir = Path(run_dir or Path(flags.save_dir) / flags.run_name)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        # run config = model args + train flags (the reference stores all
        # argparse args + datastore config in the wandb run config,
        # ref: train_model.py:271-275)
        run_config = {
            **{f"model.{k}": v for k, v in vars(model.args).items()},
            **{f"train.{k}": v for k, v in vars(flags).items()},
        }
        self.logger = MetricsLogger(
            self.run_dir, rank=self.rank, run_name=flags.run_name,
            config=run_config, project=flags.wandb_project,
            val_steps=getattr(model.args, "val_steps_to_log", ()),
        )
        if mesh is None:
            mesh = make_mesh(n_data=best_data_axis(flags.batch_size))
        self.mesh = mesh
        # multi-host: training runs lockstep on the global mesh; evaluation
        # runs host-local on each host's shard of the eval set, merged by
        # fixed-shape cross-host sums (ref: ar_model.py:311-320 gathers)
        if dist.is_multiprocess():
            if eval_model is not None and getattr(eval_model, "mesh", None) \
                    is not None:
                # host-local spatialized twin: evaluate on its local mesh
                self._eval_mesh = eval_model.mesh
            else:
                self._eval_mesh = make_mesh(
                    n_data=best_data_axis(flags.batch_size,
                                          jax.local_device_count()),
                    devices=jax.local_devices(),
                )
        else:
            self._eval_mesh = mesh
        lr = model.args.lr
        if flags.lr_schedule == "cosine":
            lr = optax.cosine_decay_schedule(lr, flags.decay_steps)
        elif flags.lr_schedule == "warmup_cosine":
            lr = optax.warmup_cosine_decay_schedule(
                0.0, lr, flags.warmup_steps, flags.decay_steps
            )
        elif flags.lr_schedule != "constant":
            raise ValueError(f"unknown lr_schedule {flags.lr_schedule!r}")
        self.optimizer = optax.adamw(
            lr, b1=0.9, b2=0.95, weight_decay=0.01
        )
        self.global_step = 0
        self.best_val_loss = float("inf")

        # model arrays (graph/statics) are passed as jit ARGUMENTS — baking
        # them in as constants hits a slow dispatch path on this TPU runtime
        model_arrays = model.arrays()
        optimizer = self.optimizer

        base_key = jax.random.PRNGKey(flags.seed)

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def train_step(arrays, params, opt_state, batch, step):
            m = model.with_arrays(arrays)
            rng = jax.random.fold_in(base_key, step)
            loss, grads = jax.value_and_grad(m.training_loss)(
                params, batch, rng
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = lambda p, o, b: train_step(
            model_arrays, p, o, b, jnp.asarray(self.global_step, jnp.int32)
        )
        self._eval_step = jit_model_method(self.eval_model,
                                           "eval_step_metrics")

    # --- setup ---

    def _maybe_profile(self):
        """Start/stop a jax.profiler trace around the configured train-step
        window; failures (e.g. a runtime without profiler support) degrade
        to a logged warning, never a crash."""
        flags = self.flags
        if not flags.profile_steps or self.rank != 0:
            return
        try:
            if self.global_step == flags.profile_start:
                jax.profiler.start_trace(str(self.run_dir / "profile"))
                self._profiling = True
            elif (getattr(self, "_profiling", False)
                  and self.global_step
                  >= flags.profile_start + flags.profile_steps):
                jax.profiler.stop_trace()
                self._profiling = False
                print(f"profiler trace written to "
                      f"{self.run_dir / 'profile'}", flush=True)
                try:  # immediate visibility without TensorBoard
                    from .trace_summary import summarize

                    s = summarize(str(self.run_dir / "profile"),
                                  line_filter="XLA Ops", top=8)
                    if not s["top"]:  # CPU backends name lines differently
                        s = summarize(str(self.run_dir / "profile"), top=8)
                    print("top device ops:", flush=True)
                    for row in s["top"]:
                        print(f"  {row['ms']:10.3f} ms  x{row['count']:<6d}"
                              f" {row['op']}", flush=True)
                except Exception as exc:
                    print(f"trace summary failed: {exc}", flush=True)
        except Exception as e:
            self._profiling = False
            self.flags = dataclasses.replace(flags, profile_steps=0)
            print(f"profiling unavailable on this runtime: {e}", flush=True)

    def _finish_profile(self):
        """Stop an open trace when training ends inside the profile
        window (otherwise the trace is never written)."""
        if getattr(self, "_profiling", False):
            try:
                jax.profiler.stop_trace()
                print(f"profiler trace written to "
                      f"{self.run_dir / 'profile'}", flush=True)
            except Exception:
                pass
            self._profiling = False

    def init_state(self, seed=None):
        seed = self.flags.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        params = self.model.init_params(key)
        opt_state = self.optimizer.init(params)
        if self.flags.load == "auto":
            # scheduler-relaunch convenience: resume from this run's own
            # "last" checkpoint when one exists (e.g. after preemption),
            # otherwise start fresh — needs a stable --run_name
            last = self.run_dir / "last"
            self.flags = dataclasses.replace(
                self.flags, load=str(last) if last.exists() else None
            )
            if self.flags.load is None:
                print(f"--load auto: no checkpoint at {last}, "
                      "starting fresh")
        if self.flags.load:
            tmpl_opt = opt_state if self.flags.restore_opt else None
            params, restored_opt, meta = load_checkpoint(
                self.flags.load, params, tmpl_opt
            )
            if self.flags.restore_opt and restored_opt is not None:
                opt_state = restored_opt
            self.global_step = int(meta.get("step", 0))
            self.best_val_loss = float(meta.get("best_val_loss", float("inf")))
            print(f"Restored checkpoint from {self.flags.load} "
                  f"(step {self.global_step})")
        params = replicate(params, self.mesh)
        opt_state = replicate(opt_state, self.mesh)
        return params, opt_state

    # --- loops ---

    def fit(self, datamodule: WeatherDataModule, params=None, opt_state=None):
        datamodule.setup("fit")
        if params is None:
            params, opt_state = self.init_state()
        flags = self.flags
        val_steps_to_log = self.model.args.val_steps_to_log

        # Preemption safety (the reference has none — SURVEY.md §5): on
        # SIGTERM/SIGINT finish the current step, save "last", then exit.
        stop_requested = {"flag": False}
        prev_handlers = {}

        def _request_stop(signum, frame):
            stop_requested["flag"] = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:
                pass  # not in main thread

        def place(batch):
            return shard_batch(tuple(jnp.asarray(b) for b in batch),
                               self.mesh)

        for epoch in range(flags.epochs):
            loader = datamodule.train_dataloader(seed=flags.seed)
            loader.set_epoch(epoch)
            t0 = time.time()
            n_batches = 0
            loss_sum = 0.0
            if flags.prefetch_batches > 0:
                batches = DevicePrefetcher(loader, place,
                                           flags.prefetch_batches)
            else:
                batches = map(place, loader)
            try:
                for batch in batches:
                    self._maybe_profile()
                    params, opt_state, loss = self._train_step(
                        params, opt_state, batch
                    )
                    self.global_step += 1
                    n_batches += 1
                    loss_sum += dist.local_scalar(loss)
                    if (flags.ckpt_every_steps
                            and self.global_step % flags.ckpt_every_steps
                            == 0):
                        save_checkpoint(
                            self.run_dir, "last", params, opt_state,
                            {"step": self.global_step, "epoch": epoch,
                             "best_val_loss": self.best_val_loss},
                        )
                    # multi-host: hosts may receive the signal at different
                    # batch indices; breaking mid-epoch would desynchronize
                    # the lockstep train-step collectives and deadlock. Defer
                    # the stop to the (synchronous) epoch boundary there.
                    if stop_requested["flag"] and not dist.is_multiprocess():
                        break
            finally:
                if isinstance(batches, DevicePrefetcher):
                    batches.close()
            dt = time.time() - t0
            train_loss = loss_sum / max(n_batches, 1)
            self.logger.log(
                {"epoch": epoch, "train_loss": train_loss,
                 "epoch_s": dt,
                 "batches_per_s": n_batches / dt if dt > 0 else 0.0},
                step=self.global_step,
            )

            if (epoch + 1) % flags.val_interval == 0:
                val_metrics = self.validate(datamodule, params)
                val_loss = val_metrics["val_mean_loss"]
                log = {"epoch": epoch, "val_mean_loss": val_loss}
                tsl = val_metrics["time_step_loss"]
                for step in val_steps_to_log:
                    if step <= len(tsl):
                        log[f"val_loss_unroll{step}"] = tsl[step - 1]
                self.logger.log(log, step=self.global_step)

                meta = {"step": self.global_step, "epoch": epoch,
                        "val_mean_loss": val_loss,
                        "best_val_loss": min(self.best_val_loss, val_loss)}
                # saves are collective in multi-host runs; the val_loss
                # branch is identical on every rank (cross-host-merged)
                if val_loss < self.best_val_loss:
                    self.best_val_loss = val_loss
                    save_checkpoint(self.run_dir, "min_val_loss", params,
                                    opt_state, meta)
                save_checkpoint(self.run_dir, "last", params, opt_state, meta)
            if stop_requested["flag"]:
                # preemption save; in multi-host runs the scheduler signals
                # every worker and each reaches this collective save after
                # finishing the current epoch (the per-batch break above is
                # single-host only)
                print("Preemption signal received: saving last checkpoint "
                      "and stopping.", flush=True)
                save_checkpoint(
                    self.run_dir, "last", params, opt_state,
                    {"step": self.global_step, "epoch": epoch,
                     "best_val_loss": self.best_val_loss,
                     "preempted": True},
                )
                break
        self._finish_profile()
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
        return params, opt_state

    def _pad_batch(self, batch):
        """Pad a partial final eval batch to the fixed batch size by
        repeating the last sample; returns (batch, n_valid)."""
        n = batch[0].shape[0]
        target = self.flags.batch_size
        if n == target:
            return batch, n
        reps = target - n
        batch = tuple(
            np.concatenate([b, np.repeat(b[-1:], reps, axis=0)], axis=0)
            for b in batch
        )
        return batch, n

    def _eval_params(self, params):
        """Host-local copy of the (replicated) params for evaluation."""
        if not dist.is_multiprocess():
            return params
        return jax.tree_util.tree_map(dist.local_value, params)

    def _zero_eval_batch(self, ar_steps):
        """All-zeros batch with the eval shapes. Multi-host: a host whose
        shard yields no batches must still reach the cross-host psum in
        summarize() — it evaluates this batch with n_valid=0, contributing
        correctly-shaped zero sums instead of raising (which would leave
        the other hosts blocked in the collective)."""
        m = self.model
        B = self.flags.batch_size
        N, d = m.num_grid_nodes, m.num_state_vars
        d_f = m.grid_dim - 2 * d - m.grid_static_dim
        z = np.zeros
        return (z((B, 2, N, d), np.float32),
                z((B, ar_steps, N, d), np.float32),
                z((B, ar_steps, N, d_f), np.float32),
                z((B, ar_steps), np.float32))

    def validate(self, datamodule, params):
        """Mean loss per unroll step + error-map stats over the val split
        (ref: ar_model.py:324-373)."""
        loader = datamodule.val_dataloader()
        params = self._eval_params(params)
        agg = _EvalAggregator()
        n_batches = 0
        for batch in loader:
            batch, n_valid = self._pad_batch(batch)
            batch = shard_batch(tuple(jnp.asarray(b) for b in batch),
                                self._eval_mesh)
            agg.add(self._eval_step(params, batch), n_valid)
            n_batches += 1
        if n_batches == 0 and dist.is_multiprocess():
            zb = shard_batch(tuple(
                jnp.asarray(b)
                for b in self._zero_eval_batch(self.flags.ar_steps_eval)
            ), self._eval_mesh)
            agg.add(self._eval_step(params, zb), 0)
        return agg.summarize()

    def test(self, datamodule, params, make_plots=True):
        """Test epoch: losses, rmse/mae error maps (rescaled to physical
        units), mean spatial loss maps, csv + figure artifacts
        (ref: ar_model.py:375-454,610-696)."""
        datamodule.setup("test")
        loader = datamodule.test_dataloader()
        params = self._eval_params(params)
        agg = _EvalAggregator(keep_spatial=True)
        example_batch = None
        for batch in loader:
            if example_batch is None:
                example_batch = batch
            batch, n_valid = self._pad_batch(batch)
            jbatch = shard_batch(tuple(jnp.asarray(b) for b in batch),
                                 self._eval_mesh)
            agg.add(self._eval_step(params, jbatch), n_valid)
        if example_batch is None and dist.is_multiprocess():
            zb = shard_batch(tuple(
                jnp.asarray(b)
                for b in self._zero_eval_batch(self.flags.ar_steps_eval)
            ), self._eval_mesh)
            agg.add(self._eval_step(params, zb), 0)
        summary = agg.summarize()
        make_plots = make_plots and self.rank == 0

        model = self.eval_model
        datastore = model.datastore
        state_std = np.asarray(model.statics.state_std)
        log = {"test_mean_loss": summary["val_mean_loss"]}
        for step in model.args.val_steps_to_log:
            if step <= len(summary["time_step_loss"]):
                log[f"test_loss_unroll{step}"] = summary["time_step_loss"][step - 1]
        self.logger.log(log)

        artifacts = {}
        var_names = datastore.get_vars_names("state")
        # file artifacts are rank-0-only: every host holds the identical
        # cross-host-merged summary, and on a shared filesystem two ranks
        # writing the same path concurrently could interleave
        write_files = self.rank == 0
        for name in ("mse", "mae"):
            arr = summary[name]  # (T, d) mean over samples
            if "mse" in name:
                arr = np.sqrt(arr)
                out_name = name.replace("mse", "rmse")
            else:
                out_name = name
            rescaled = arr * state_std  # (T, d)
            artifacts[f"test_{out_name}"] = rescaled
            if write_files:
                np.savetxt(self.run_dir / f"test_{out_name}.csv", rescaled,
                           delimiter=",")
            # watched metrics: exact values for chosen vars/lead times
            # (ref: ar_model.py:599-606)
            full_log_name = f"test_{out_name}"
            if full_log_name in model.args.metrics_watch:
                watch_log = {}
                for var_i, steps in model.args.var_leads_metrics_watch.items():
                    for step in steps:
                        if step - 1 < rescaled.shape[0]:
                            key = (f"{full_log_name}_"
                                   f"{var_names[int(var_i)]}_step_{step}")
                            watch_log[key] = float(rescaled[step - 1, int(var_i)])
                if watch_log:
                    self.logger.log(watch_log)

        spatial = summary.get("mean_spatial_loss")
        if spatial is not None and write_files:
            np.save(self.run_dir / "mean_spatial_loss.npy", spatial)
            # per-logged-lead-time maps: lead time t_i is unroll index t_i - 1
            for t_i in model.args.val_steps_to_log:
                if 1 <= t_i <= spatial.shape[0]:
                    np.save(self.run_dir / f"spatial_loss_t{t_i}.npy",
                            spatial[t_i - 1])

        if make_plots:
            from . import vis

            for name, arr in artifacts.items():
                fig = vis.plot_error_map(arr, datastore)
                fig.savefig(self.run_dir / f"{name}.pdf")
                self.logger.log_image(name, fig)
            if spatial is not None:
                # `spatial` is (T, N) over consecutive unroll steps; save a
                # map only at each logged lead time t_i, reading unroll index
                # t_i - 1 (ref: ar_model.py:428-436 stores maps at exactly
                # the logged steps)
                for t_i in model.args.val_steps_to_log:
                    if not 1 <= t_i <= spatial.shape[0]:
                        continue
                    fig = vis.plot_spatial_error(
                        spatial[t_i - 1], datastore,
                        title=f"Test loss, t={t_i} "
                              f"({datastore.step_length * t_i} h)",
                    )
                    fig.savefig(self.run_dir / f"spatial_loss_t{t_i}.pdf")
                    self.logger.log_image(f"test_loss_t{t_i}", fig)
            if example_batch is not None:
                self.plot_examples(example_batch, params, n_examples=min(
                    model.args.n_example_pred, example_batch[0].shape[0]
                ))
        return {**log, **{k: v.tolist() for k, v in artifacts.items()}}

    def plot_examples(self, batch, params, n_examples=1, split="test"):
        """Per-variable per-step prediction/target figures
        (ref: ar_model.py:456-566)."""
        from . import vis

        model = self.eval_model
        datastore = model.datastore
        jbatch = tuple(jnp.asarray(b) for b in batch)
        prediction, target, _, _ = model.common_step(params, jbatch)
        state_mean = np.asarray(model.statics.state_mean)
        state_std = np.asarray(model.statics.state_std)
        pred = np.asarray(prediction) * state_std + state_mean
        tgt = np.asarray(target) * state_std + state_mean
        var_names = datastore.get_vars_names("state")
        var_units = datastore.get_vars_units("state")
        for ex in range(n_examples):
            np.save(self.run_dir / f"example_pred_{ex + 1}.npy", pred[ex])
            np.save(self.run_dir / f"example_target_{ex + 1}.npy", tgt[ex])
            for t_i in range(pred.shape[1]):
                for var_i, (vn, vu) in enumerate(zip(var_names, var_units)):
                    fig = vis.plot_prediction(
                        pred[ex, t_i, :, var_i], tgt[ex, t_i, :, var_i],
                        datastore,
                        title=f"{vn} ({vu}), t={t_i + 1} "
                              f"({datastore.step_length * (t_i + 1)} h)",
                    )
                    fig.savefig(
                        self.run_dir
                        / f"example_{ex + 1}_{vn}_t{t_i + 1}.png"
                    )
                    self.logger.log_image(f"{vn}_example_{ex + 1}", fig)
                    import matplotlib.pyplot as plt

                    plt.close("all")


def _trainer_evaluate_ensemble(self, datamodule, params, n_members=5,
                               seed=0):
    """Ensemble CRPS/spread/rmse over the test split (output_std models)."""
    import jax

    from .ensemble import evaluate_ensemble

    from .parallel import distributed as dist

    datamodule.setup("test")
    loader = datamodule.test_dataloader()
    params = self._eval_params(params)
    sums, n = None, 0
    key = jax.random.PRNGKey(seed + jax.process_index())
    for batch in loader:
        # padded tail batches are evaluated per-sample and the padding
        # sliced off, matching _EvalAggregator's n_valid handling
        batch, n_valid = self._pad_batch(batch)
        key, sub = jax.random.split(key)
        jb = tuple(jnp.asarray(b) for b in batch)
        out = evaluate_ensemble(self.eval_model, params, jb, sub, n_members,
                                per_sample=True)
        out = {k: np.asarray(v)[:n_valid].sum(axis=0) for k, v in out.items()}
        sums = out if sums is None else {
            k: sums[k] + out[k] for k in out
        }
        n += n_valid
    if dist.is_multiprocess():
        if sums is None:
            # zero-shard host: contribute zero sums to the collective
            zb = tuple(jnp.asarray(b) for b in self._zero_eval_batch(
                self.flags.ar_steps_eval
            ))
            out = evaluate_ensemble(self.eval_model, params, zb,
                                    jax.random.PRNGKey(0), n_members,
                                    per_sample=True)
            sums = {k: np.asarray(v)[:0].sum(axis=0) for k, v in out.items()}
        merged = dist.psum_across_hosts(
            {**sums, "n": np.asarray(float(n))}
        )
        n = float(merged.pop("n"))
        sums = merged
    from .ensemble import spread_skill_ratio

    result = {k: v / max(n, 1) for k, v in (sums or {}).items()}
    # spread-skill ratio from the aggregated variance / squared-error
    # means (ratio of means, not mean of per-sample ratios)
    if "ens_var" in result and "ens_se" in result:
        result["ssr"] = spread_skill_ratio(
            result["ens_var"], result["ens_se"], n_members
        )
    rank = result.pop("rank_hist", None)
    result = {k: np.asarray(v).tolist() for k, v in result.items()}
    if rank is not None and n > 0:
        freq = rank / np.maximum(rank.sum(axis=-1, keepdims=True), 1.0)
        np.save(self.run_dir / "ens_rank_hist.npy", freq)  # (T, m+1)
        result["rank_hist"] = freq.tolist()
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(5, 3))
            ax.bar(np.arange(freq.shape[-1]), freq.mean(axis=0))
            ax.axhline(1.0 / freq.shape[-1], color="k", ls="--", lw=0.8)
            ax.set_xlabel("rank of observation")
            ax.set_ylabel("frequency")
            ax.set_title(f"{n_members}-member rank histogram (all lead times)")
            fig.tight_layout()
            fig.savefig(self.run_dir / "ens_rank_hist.png")
            self.logger.log_image("ens_rank_hist", fig)
            plt.close(fig)
        except Exception as exc:  # plotting must never fail an eval
            print(f"rank-histogram plot failed: {exc}")
    self.logger.log({f"ens_{k}_mean": float(np.mean(v))
                     for k, v in result.items() if k != "rank_hist"})
    return result


Trainer.evaluate_ensemble = _trainer_evaluate_ensemble


class _EvalAggregator:
    """Accumulates eval_step_metrics outputs across batches
    (ref: ar_model.py:610-644 — gather, mean over samples)."""

    def __init__(self, keep_spatial=False):
        self.keep_spatial = keep_spatial
        self.tsl_list = []
        self.mse_list = []
        self.mae_list = []
        self.spatial_sum = None
        self.spatial_n = 0

    def add(self, out, n_valid=None):
        """Accumulate one eval step; padded rows beyond n_valid dropped."""
        sl = slice(None, n_valid)
        self.tsl_list.append(np.asarray(out["time_step_loss"])[sl])
        self.mse_list.append(np.asarray(out["mse"])[sl])
        self.mae_list.append(np.asarray(out["mae"])[sl])
        if self.keep_spatial:
            sp = np.asarray(out["spatial_loss"])[sl]
            self.spatial_n += sp.shape[0]
            self.spatial_sum = sp.sum(axis=0) if self.spatial_sum is None else (
                self.spatial_sum + sp.sum(axis=0)
            )

    def summarize(self):
        if not self.tsl_list:
            raise ValueError(
                "no evaluation batches were produced — the split may have "
                "fewer samples than the batch size"
                + (" on every host" if dist.is_multiprocess() else "")
            )
        tsl = np.concatenate(self.tsl_list, axis=0)  # (n, T)
        mse = np.concatenate(self.mse_list, axis=0)
        mae = np.concatenate(self.mae_list, axis=0)
        sums = {
            "n": np.asarray(float(tsl.shape[0])),
            "tsl": tsl.sum(axis=0),
            "mse": mse.sum(axis=0),
            "mae": mae.sum(axis=0),
        }
        if self.keep_spatial and self.spatial_sum is not None:
            sums["spatial"] = self.spatial_sum
            sums["spatial_n"] = np.asarray(float(self.spatial_n))
        # multi-host: every host reduced a disjoint shard of the eval set;
        # combine the fixed-shape sums (single-host: identity)
        sums = dist.psum_across_hosts(sums)
        n = max(float(sums["n"]), 1.0)
        out = {
            "time_step_loss": sums["tsl"] / n,
            "val_mean_loss": float((sums["tsl"] / n).mean()),
            "mse": sums["mse"] / n,
            "mae": sums["mae"] / n,
        }
        if "spatial" in sums:
            out["mean_spatial_loss"] = (
                sums["spatial"] / max(float(sums["spatial_n"]), 1.0)
            )
        return out


def main(input_args=None):
    """CLI mirroring `python -m neural_lam.train_model`
    (ref: train_model.py:27-300)."""
    parser = ArgumentParser(description="Train or evaluate NeuralLAM-TPU models")
    parser.add_argument("--config_path", type=str,
                        help="Path to the configuration for neural-lam")
    parser.add_argument("--model", type=str, default="graph_lam",
                        choices=sorted(MODELS.keys()))
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--load", type=str,
                        help="checkpoint path to load, or 'auto' to resume "
                             "from <save_dir>/<run_name>/last when it "
                             "exists (pair with --restore_opt for a true "
                             "resume)")
    parser.add_argument("--restore_opt", action="store_true")
    parser.add_argument("--precision", type=str, default="32",
                        choices=["32", "bf16", "bf16-mixed"])
    # multi-host (ref: train_model.py:276-286 DDP over num_nodes; here
    # jax.distributed over DCN — on TPU pods the three flags are discovered
    # from the environment and only --num_nodes is needed)
    parser.add_argument("--num_nodes", type=int, default=1,
                        help="number of hosts/processes in the job")
    parser.add_argument("--node_rank", type=int, default=None,
                        help="this process's rank (TPU pods: auto)")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (TPU pods: auto)")
    # model architecture (ref: train_model.py:87-134)
    parser.add_argument("--graph", type=str, default="multiscale")
    parser.add_argument("--hidden_dim", type=int, default=64)
    parser.add_argument("--hidden_layers", type=int, default=1)
    parser.add_argument("--processor_layers", type=int, default=4)
    parser.add_argument("--mesh_aggr", type=str, default="sum",
                        choices=["sum", "mean"])
    parser.add_argument("--output_std", action="store_true")
    parser.add_argument("--latent_dim", type=int, default=32,
                        help="graph_efm: per-mesh-node latent width")
    parser.add_argument("--kl_beta", type=float, default=1e-3,
                        help="graph_efm: ELBO KL weight")
    parser.add_argument("--remat", action="store_true",
                        help="gradient-checkpoint each unroll step "
                             "(memory for compute in long-AR training)")
    parser.add_argument("--crps_members", type=int, default=4,
                        help="graph_efm with --loss crps_ens: ensemble "
                             "members per training sample")
    # training hyper-params (ref: train_model.py:135-166)
    parser.add_argument("--ar_steps_train", type=int, default=1)
    parser.add_argument("--ar_steps_eval", type=int, default=10)
    parser.add_argument("--loss", type=str, default="wmse")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--lr_schedule", default="constant",
                        choices=["constant", "cosine", "warmup_cosine"])
    parser.add_argument("--warmup_steps", type=int, default=1000)
    parser.add_argument("--decay_steps", type=int, default=100_000)
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler trace of N train "
                             "steps into <run_dir>/profile")
    parser.add_argument("--val_interval", type=int, default=1)
    parser.add_argument("--num_past_forcing_steps", type=int, default=1)
    parser.add_argument("--num_future_forcing_steps", type=int, default=1)
    parser.add_argument("--prefetch_batches", type=int, default=2,
                        help="device-prefetch depth: batches transferred "
                             "ahead of the step (0 = synchronous)")
    parser.add_argument("--num_workers", type=int, default=4,
                        help="loader worker threads (ref: torch DataLoader "
                        "num_workers); <=1 uses a single prefetch thread")
    # evaluation (ref: train_model.py:167-208)
    parser.add_argument("--eval", type=str, choices=["val", "test"])
    parser.add_argument("--n_example_pred", type=int, default=1)
    parser.add_argument("--val_steps_to_log", nargs="+", type=int,
                        default=[1, 2, 3, 5, 10, 15, 19])
    parser.add_argument("--metrics_watch", nargs="+", default=[],
                        help="names of metrics to log watched values for")
    parser.add_argument("--var_leads_metrics_watch", type=str, default="{}",
                        help="JSON dict var_index -> [lead steps] to watch")
    parser.add_argument("--run_name", type=str, default=None)
    parser.add_argument("--wandb_project", type=str,
                        default="neural_lam_tpu",
                        help="W&B project to log to (when wandb is "
                             "importable; ref: train_model.py:169)")
    parser.add_argument("--save_dir", type=str, default="saved_models")
    parser.add_argument("--spatial_shards", type=int, default=1,
                        help="shard grid nodes over this many devices "
                             "(the mesh 'space' axis)")
    parser.add_argument("--spatial_scheme", type=str, default="grid",
                        choices=["grid", "mesh_rs", "mesh_halo"],
                        help="grid: grid-sharded mesh-replicated; "
                             "mesh_rs: mesh-node sharding via reduce-"
                             "scatter/all-gather (hierarchical graphs "
                             "shard the bottom level) — 40-60%% less "
                             "collective traffic and sharded mesh-node "
                             "MLPs; mesh_halo: mesh_rs with CUT-EDGE "
                             "halo exchange (ppermute of the ~2-4%% "
                             "boundary rows instead of full-table "
                             "all-gathers; docs/SCALING.md). mesh_rs/"
                             "mesh_halo support EVERY family incl. the "
                             "latent graph_efm/hi_efm; so does grid")
    parser.add_argument("--ensemble_members", type=int, default=0,
                        help="with --eval test on an --output_std model: "
                             "also compute m-member ensemble CRPS/spread")
    args = parser.parse_args(input_args)
    assert args.config_path is not None, "Specify your config with --config_path"

    random.seed(args.seed)
    np.random.seed(args.seed)

    multihost = args.num_nodes > 1 or args.coordinator_address is not None
    if multihost:
        rank, world = dist.init_multihost(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_nodes,
            process_id=args.node_rank,
        )
        print(f"multi-host: process {rank}/{world}, "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices", flush=True)

    config, datastore = load_config_and_datastore(config_path=args.config_path)

    model_args = ModelArgs(
        graph=args.graph,
        hidden_dim=args.hidden_dim,
        hidden_layers=args.hidden_layers,
        processor_layers=args.processor_layers,
        mesh_aggr=args.mesh_aggr,
        output_std=args.output_std,
        loss=args.loss,
        lr=args.lr,
        num_past_forcing_steps=args.num_past_forcing_steps,
        num_future_forcing_steps=args.num_future_forcing_steps,
        val_steps_to_log=tuple(args.val_steps_to_log),
        metrics_watch=tuple(args.metrics_watch),
        var_leads_metrics_watch={
            int(k): v for k, v in json.loads(args.var_leads_metrics_watch).items()
        },
        restore_opt=args.restore_opt,
        n_example_pred=args.n_example_pred,
        compute_dtype="bfloat16" if args.precision.startswith("bf16") else None,
        latent_dim=args.latent_dim,
        kl_beta=args.kl_beta,
        crps_members=args.crps_members,
        remat=args.remat,
    )
    flags = TrainFlags(
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
        decay_steps=args.decay_steps,
        profile_steps=args.profile_steps,
        prefetch_batches=args.prefetch_batches,
        ar_steps_train=args.ar_steps_train,
        ar_steps_eval=args.ar_steps_eval,
        val_interval=args.val_interval,
        seed=args.seed,
        num_nodes=args.num_nodes,
        load=args.load,
        restore_opt=args.restore_opt,
        eval=args.eval,
        precision=args.precision,
        run_name=args.run_name
        or f"{args.model}-{args.processor_layers}x{args.hidden_dim}-"
           f"{time.strftime('%m_%d_%H_%M')}",
        save_dir=args.save_dir,
        wandb_project=args.wandb_project,
    )

    datamodule = WeatherDataModule(
        datastore,
        ar_steps_train=args.ar_steps_train,
        ar_steps_eval=args.ar_steps_eval,
        standardize=True,
        num_past_forcing_steps=args.num_past_forcing_steps,
        num_future_forcing_steps=args.num_future_forcing_steps,
        batch_size=args.batch_size,
        shard=dist.host_shard() if multihost else (1, 0),
        num_workers=args.num_workers,
    )

    model = MODELS[args.model](model_args, config, datastore)
    eval_model = None
    mesh = None
    if args.spatial_shards > 1:
        from .parallel.grid_sharded import spatialize, spatialize_rs

        n_space = args.spatial_shards

        def spat(m, on_mesh):
            if args.spatial_scheme in ("mesh_rs", "mesh_halo"):
                return spatialize_rs(
                    m, on_mesh, halo=args.spatial_scheme == "mesh_halo"
                )
            return spatialize(m, on_mesh)

        if multihost:
            # 'space' stays inside each host's ICI domain, 'data' spans
            # hosts over DCN (one gradient all-reduce per step). Eval runs
            # host-local (per-host eval shards, cross-host metric sums),
            # so it gets a twin sharded over this host's local mesh.
            mesh = dist.make_global_mesh(n_space=n_space)
            n_local = jax.local_device_count()
            assert n_local % n_space == 0, (n_local, n_space)
            local_mesh = make_mesh(
                n_data=n_local // n_space, n_space=n_space,
                devices=jax.local_devices(),
            )
            eval_model = spat(model, local_mesh)
        else:
            n_dev = len(jax.devices())
            assert n_dev % n_space == 0, (n_dev, n_space)
            mesh = make_mesh(
                n_data=min(best_data_axis(args.batch_size),
                           n_dev // n_space),
                n_space=n_space,
            )
        model = spat(model, mesh)
    elif multihost:
        mesh = dist.make_global_mesh(n_space=1)
    if multihost:
        global_batch = args.batch_size * jax.process_count()
        assert global_batch % mesh.shape["data"] == 0, (
            f"per-host batch {args.batch_size} x {jax.process_count()} hosts "
            f"must be divisible by the global data axis "
            f"({mesh.shape['data']} devices)"
        )
    trainer = Trainer(model, flags, mesh=mesh, eval_model=eval_model)

    if args.eval:
        params, opt_state = trainer.init_state()
        if args.eval == "val":
            datamodule.setup("fit")
            print(trainer.validate(datamodule, params))
        else:
            print(trainer.test(datamodule, params))
            if args.ensemble_members > 0 and (
                    args.output_std or getattr(model, "is_latent", False)):
                print(trainer.evaluate_ensemble(
                    datamodule, params, n_members=args.ensemble_members
                ))
    else:
        trainer.fit(datamodule)


if __name__ == "__main__":
    main()
