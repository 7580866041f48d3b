"""The training loop — replaces PyTorch-Lightning's Trainer.

Responsibilities (reference equivalents in parens):
  * jit train/eval steps over the mesh (PL + DDP strategy `train.py:630-639`)
  * periodic eval with host metrics (val loop + torchmetrics `train.py:361-379`)
  * best-metric tracking on a monitor key (ModelCheckpoint monitor)
  * checkpoint save/restore incl. loader state (fault-tolerant resume)
  * step/epoch wall-time metrics (Timer callback `src/callbacks/timer.py`)
  * JSONL metrics log + stdout (CustomWandbLogger stand-in; wandb optional)
  * seqlen-warmup staged training (SeqlenWarmupReload
    `src/callbacks/seqlen_warmup_reload.py`) via `TrainLoop.run_stages`
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dna_tpu.config.core import ExperimentConfig
from dna_tpu.data.loader import ShardedLoader
from dna_tpu.experiments import Experiment
from dna_tpu.train import metrics_host
from dna_tpu.train.checkpoint import CheckpointManager
from dna_tpu.train.state import create_train_state, param_count
from dna_tpu.train.step import make_eval_step, make_predict_step, make_train_step


@dataclass
class LoopResult:
    final_metrics: Dict[str, float]
    best_metric: Optional[float]
    history: List[Dict[str, float]] = field(default_factory=list)
    steps_done: int = 0


class MetricsLogger:
    """JSONL metrics sink with an optional wandb mirror (reference
    CustomWandbLogger, `train.py:52-132`). wandb is not a hard dependency:
    when it isn't importable (or init fails) the sink silently degrades to
    JSONL-only, like the reference's rank-nonzero DummyExperiment."""

    def __init__(self, log_dir: Optional[str], name: str,
                 wandb_project: Optional[str] = None,
                 wandb_init_retries: int = 3):
        self.path = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{name}_metrics.jsonl")
            self._f = open(self.path, "a")
        self._wandb = None
        if wandb_project and jax.process_index() == 0:
            self._wandb = _init_wandb(wandb_project, name, wandb_init_retries)

    def log(self, record: Dict[str, Any]):
        if self.path:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()
        if self._wandb is not None:
            try:
                self._wandb.log(record, step=int(record.get("step", 0)))
            except Exception:
                pass

    def log_histograms(self, arrays: Dict[str, Any], step: int):
        """wandb.watch equivalent (reference `callbacks/wandb.py`): log each
        named sample array as a wandb.Histogram. No-op without a mirror."""
        if self._wandb is None or not arrays:
            return
        try:
            import wandb  # type: ignore

            self._wandb.log(
                {k: wandb.Histogram(v) for k, v in arrays.items()},
                step=step)
        except Exception:
            pass

    def log_artifact(self, path: str, name: str, type_: str = "model"):
        """Upload a file/directory as a wandb artifact (the upload half of
        the reference's wandb callbacks, `src/callbacks/wandb.py` — model
        checkpoints + code snapshot). No-op without an active mirror."""
        if self._wandb is None:
            return
        try:
            import wandb  # type: ignore

            art = wandb.Artifact(name=name, type=type_)
            if os.path.isdir(path):
                art.add_dir(path)
            else:
                art.add_file(path)
            self._wandb.log_artifact(art)
        except Exception:
            pass

    def close(self):
        if self.path:
            self._f.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass


def _init_wandb(project: str, name: str, retries: int):
    """Bounded-retry wandb.init (the reference retries forever with 30-60 s
    backoff, `train.py:117-125`; bounded here so CI can't hang)."""
    try:
        import wandb  # type: ignore
    except ImportError:
        return None
    for attempt in range(retries):
        try:
            return wandb.init(project=project, name=name, resume="allow")
        except Exception:
            time.sleep(min(2.0 * (attempt + 1), 10.0))
    return None


class TransformLoader:
    """Wraps a loader, applying `fn` to every batch; forwards resume state.
    Used for progressive resizing (resolution subsampling at collate level,
    reference `base.py:109-133`)."""

    def __init__(self, loader: ShardedLoader, fn):
        self._loader = loader
        self._fn = fn

    def __iter__(self):
        for batch in self._loader:
            yield self._fn(batch)

    @property
    def state(self):
        return self._loader.state

    @state.setter
    def state(self, value):
        self._loader.state = value


def subsample_batch(batch: Dict[str, Any], resolution: int) -> Dict[str, Any]:
    """Stride-subsample the [B, L] *sequence* fields (reference
    `SequenceResolutionCollateMixin._collate_callback`: take every
    `resolution`-th element). Non-sequence 2-D fields (e.g. [B, n_targets]
    regression labels) must not be touched — only input_ids/attention_mask,
    and labels only when they are per-position (same length as input_ids)."""
    if resolution <= 1:
        return batch
    seq_len = np.asarray(batch["input_ids"]).shape[1]
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        is_seq = (arr.ndim >= 2 and arr.shape[1] == seq_len and
                  k in ("input_ids", "attention_mask", "labels"))
        out[k] = arr[:, ::resolution] if is_seq else arr
    return out


class TrainLoop:
    def __init__(self, exp: Experiment, *, eval_dataset=None,
                 eval_datasets: Optional[Dict[str, Any]] = None,
                 monitor: Optional[str] = None, monitor_mode: str = "max",
                 log_dir: Optional[str] = None, host_metrics: tuple = (),
                 verbose: bool = True):
        self.exp = exp
        self.cfg: ExperimentConfig = exp.cfg
        self.eval_dataset = (eval_dataset if eval_dataset is not None
                             else getattr(exp, "eval_dataset", None))
        # named eval loaders evaluated each eval tick (reference val-loader
        # multiplexing, `train.py:558-582`); "/ema" duplicates are implicit —
        # eval_step already uses EMA params when train.ema > 0
        self.eval_datasets = dict(eval_datasets or {})
        self.monitor = monitor
        self.monitor_mode = monitor_mode
        self.host_metrics = tuple(host_metrics)
        self.verbose = verbose
        self.logger = MetricsLogger(log_dir, exp.cfg.name,
                                    wandb_project=exp.cfg.train.wandb_project)

        self.mesh = exp.mesh
        seq_len = exp.cfg.data.max_length
        dummy = jnp.zeros((2, seq_len), jnp.int32)

        def init_params(rng):
            return exp.model.init(rng, dummy, None,
                                  deterministic=True)["params"]

        self.state, self.shardings = create_train_state(
            init_params, exp.tx, self.mesh, exp.rules,
            jax.random.key(exp.cfg.train.seed), ema=exp.cfg.train.ema)
        deterministic = exp.cfg.model.dropout == 0.0
        self.train_step = make_train_step(
            exp.model, exp.task_fn, exp.tx, self.mesh, exp.rules,
            self.shardings, ema=exp.cfg.train.ema,
            deterministic=deterministic,
            mlm_gather=getattr(exp.cfg.model, "mlm_gather", 0.0),
            mlm_probability=getattr(exp.cfg.data, "mlm_probability", None),
            track_param_norms=exp.cfg.train.track_param_norms,
            track_act_norms=exp.cfg.train.track_act_norms,
            watch=exp.cfg.train.wandb_watch)
        self.eval_step = make_eval_step(exp.model, exp.task_fn, self.mesh,
                                        exp.rules, self.shardings)
        # raw-params eval alongside the EMA one (the reference evaluates val
        # and its `/ema` duplicate, `train.py:442-455,558-582`) so EMA-vs-raw
        # regressions are visible
        self.eval_step_raw = make_eval_step(
            exp.model, exp.task_fn, self.mesh, exp.rules, self.shardings,
            use_ema=False) if exp.cfg.train.ema > 0.0 else None
        self.predict_step = make_predict_step(exp.model, self.mesh, exp.rules,
                                              self.shardings)
        self.ckpt: Optional[CheckpointManager] = None
        if exp.cfg.train.checkpoint_dir:
            self.ckpt = CheckpointManager(exp.cfg.train.checkpoint_dir)
        self.n_params = param_count(self.state.params)
        if exp.cfg.train.wandb_upload:
            # code-snapshot artifact at run start (reference
            # `src/callbacks/wandb.py` code upload)
            pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            self.logger.log_artifact(pkg, f"{exp.cfg.name}-code", "code")

    # ------------------------------------------------------------------

    def _log(self, msg: str):
        if self.verbose:
            print(msg, flush=True)

    def _host_slots(self) -> Dict[str, int]:
        """This process's slice of every global batch (multi-host data
        feeding, `parallel/multihost.py`). Identity on a single host."""
        return dict(host_id=jax.process_index(),
                    host_count=jax.process_count())

    def _global_batch(self, batch):
        from dna_tpu.parallel.multihost import make_global_batch

        return make_global_batch(batch, self.mesh)

    def evaluate(self, dataset=None, max_batches: Optional[int] = None
                 ) -> Dict[str, float]:
        dataset = dataset if dataset is not None else self.eval_dataset
        if dataset is None:
            return {}
        loader = ShardedLoader(dataset, self.cfg.data.batch_size, seed=1,
                               shuffle=False, **self._host_slots())
        sums: Dict[str, float] = {}
        count = 0
        all_logits, all_labels = [], []
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            host_batch = batch
            batch = self._global_batch(batch)
            m = self.eval_step(self.state, batch)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            if self.eval_step_raw is not None:
                for k, v in self.eval_step_raw(self.state, batch).items():
                    sums[f"raw/{k}"] = sums.get(f"raw/{k}", 0.0) + float(v)
            if self.host_metrics:
                # each host keeps only its own slab of the global logits;
                # one process-allgather after the loop makes MCC/F1/AUROC
                # world-size-independent (reference: torchmetrics
                # dist_reduce_fx, `src/tasks/torchmetrics.py:92-98`)
                from dna_tpu.parallel.multihost import local_rows

                logits = self.predict_step(self.state, batch)
                all_logits.append(local_rows(logits).astype(np.float32))
                all_labels.append(np.asarray(host_batch["labels"]))
            count += 1
        out = {f"val/{k}": v / max(count, 1) for k, v in sums.items()}
        if self.host_metrics and all_logits:
            from dna_tpu.parallel.multihost import all_hosts_concat

            # metric fns are order-invariant, so host-major concat order
            # (host 0's batches, then host 1's, ...) is fine
            logits = all_hosts_concat(np.concatenate(all_logits))
            labels = all_hosts_concat(np.concatenate(all_labels))
            if logits.ndim == 3 and labels.ndim == 2:
                # token-level task: score only supervised positions
                # (ignore_index=-100 elsewhere), flattened
                valid = labels != -100
                logits, labels = logits[valid], labels[valid]
            for name in self.host_metrics:
                out[f"val/{name}"] = metrics_host.compute_metric(
                    name, labels, logits)
            # eval artifacts for classification tasks: confusion matrix +
            # per-class precision/recall/F1 into the metrics stream (the
            # reference's per-epoch wandb heatmaps, `callbacks/wandb.py:
            # 90-123`); kept out of the scalar dict, logged as one record
            if (logits.ndim == 2 and logits.shape[-1] <= 256
                    and np.issubdtype(labels.dtype, np.integer)):
                n_cls = logits.shape[-1]
                preds = logits.argmax(-1)
                cm = metrics_host.confusion_matrix(labels, preds, n_cls)
                prec, rec, f1c = metrics_host.per_class_prf(labels, preds,
                                                            n_cls)
                self.logger.log({
                    "type": "eval_artifacts",
                    "step": int(self.state.step),
                    "confusion_matrix": cm.tolist(),
                    "per_class": {"precision": [round(float(x), 6) for x in prec],
                                  "recall": [round(float(x), 6) for x in rec],
                                  "f1": [round(float(x), 6) for x in f1c]},
                })
        return out

    def run(self, steps: Optional[int] = None,
            loader: Optional[ShardedLoader] = None) -> LoopResult:
        cfg = self.cfg
        steps = steps if steps is not None else cfg.train.steps
        if loader is None:
            loader = ShardedLoader(self.exp.dataset, cfg.data.batch_size,
                                   seed=cfg.data.seed, **self._host_slots())

        # resume FIRST: the debug step cap and the val-at-start pass must see
        # the restored state, not the fresh init
        if self.ckpt and cfg.train.resume and self.ckpt.latest_step() is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=x.sharding),
                self.state)
            self.state, loader_state, _ = self.ckpt.restore(abstract)
            if loader_state is not None:
                loader.state = loader_state
            self._log(f"resumed from step {int(self.state.step)}")

        if cfg.train.debug:
            steps = min(steps, int(self.state.step) + cfg.train.debug_steps)

        startup_evals: List[Dict[str, float]] = []
        if cfg.train.validate_at_start or cfg.train.debug:
            ev = self.evaluate(max_batches=cfg.train.eval_steps)
            if ev:
                ev["step"] = int(self.state.step)
                self.logger.log(ev)
                startup_evals.append(ev)
                self._log("val@start: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in ev.items() if k != "step"))

        best = None
        history: List[Dict[str, float]] = list(startup_evals)
        start_step = int(self.state.step)
        it = iter(loader)
        t_last = time.perf_counter()
        tokens_per_batch = cfg.data.batch_size * cfg.data.max_length

        for step_i in range(start_step, steps):
            batch = self._global_batch(next(it))
            self.state, metrics = self.train_step(self.state, batch)

            if cfg.train.wandb_watch:
                # strip the histogram samples from the scalar stream; log
                # them to the wandb mirror at the watch frequency
                watch = {k: metrics.pop(k) for k in
                         [k for k in metrics if k.startswith("_watch/")]}
                if (step_i + 1) % max(1, cfg.train.wandb_watch_freq) == 0:
                    self.logger.log_histograms(
                        {k[len("_watch/"):]: np.asarray(v)
                         for k, v in watch.items()}, step_i + 1)

            if cfg.train.debug:
                loss = float(metrics.get("loss", 0.0))
                if not np.isfinite(loss):
                    raise FloatingPointError(
                        f"non-finite loss {loss} at step {step_i + 1}")
                dropped = float(metrics.get("mlm_dropped_positions", 0.0))
                if dropped > 0:
                    raise ValueError(
                        f"mlm_gather budget overflow: {int(dropped)} masked "
                        f"positions dropped at step {step_i + 1} — raise "
                        f"model.mlm_gather or check data.mlm_probability")

            if cfg.train.log_every and (step_i + 1) % cfg.train.log_every == 0:
                now = time.perf_counter()
                dt = (now - t_last) / cfg.train.log_every
                t_last = now
                rec = {k: float(v) for k, v in metrics.items()}
                rec.update(step=step_i + 1, sec_per_step=round(dt, 4),
                           tokens_per_sec=round(tokens_per_batch / dt, 1))
                self.logger.log(rec)
                self._log(f"step {step_i+1}: loss={rec.get('loss', 0):.4f} "
                          f"{dt*1e3:.0f} ms/step")
                history.append(rec)

            if cfg.train.eval_every and (step_i + 1) % cfg.train.eval_every == 0:
                ev = self.evaluate(max_batches=cfg.train.eval_steps)
                for split, ds in self.eval_datasets.items():
                    sub = self.evaluate(dataset=ds,
                                        max_batches=cfg.train.eval_steps)
                    ev.update({k.replace("val/", f"{split}/"): v
                               for k, v in sub.items()})
                ev["step"] = step_i + 1
                self.logger.log(ev)
                self._log(f"eval @ {step_i+1}: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in ev.items() if k != "step"))
                history.append(ev)
                if self.monitor and self.monitor in ev:
                    v = ev[self.monitor]
                    better = (best is None or
                              (v > best if self.monitor_mode == "max" else v < best))
                    if better:
                        best = v
                        if self.ckpt:
                            self.ckpt.save(step_i + 1, self.state,
                                           loader.state, {"best": best})
                            if cfg.train.wandb_upload:
                                self.logger.log_artifact(
                                    cfg.train.checkpoint_dir,
                                    f"{cfg.name}-best", "model")

            if (self.ckpt and cfg.train.checkpoint_every and
                    (step_i + 1) % cfg.train.checkpoint_every == 0):
                self.ckpt.save(step_i + 1, self.state, loader.state)

        final = {k: float(v) for k, v in metrics.items()} if steps > start_step else {}
        return LoopResult(final_metrics=final, best_metric=best,
                          history=history, steps_done=steps - start_step)

    def run_stages(self) -> LoopResult:
        """Staged sequence-length warmup (reference SeqlenWarmupReload,
        `src/callbacks/seqlen_warmup_reload.py`): each stage re-creates the
        dataset at its seq_len *through the dataset registry* (so real
        datasets — hg38 bed/fasta etc. — restage exactly like synthetics) and
        re-jits at the (seq_len, batch) shape; params and optimizer state
        carry across stages. Stages may carry a 4th element, the per-stage
        grad-accumulation factor (reference `train.py:644-661`), already
        baked into the optimizer by `make_accum_schedule`."""
        import dataclasses as dc
        import warnings

        from dna_tpu import registry

        results = []
        total = 0
        for stage in self.cfg.train.seqlen_stages:
            seq_len, batch_size, stage_steps = stage[:3]
            accum = stage[3] if len(stage) > 3 else 1
            self._log(f"stage: L={seq_len} B={batch_size} steps={stage_steps}"
                      + (f" accum={accum}" if accum > 1 else ""))
            data_cfg = dc.replace(self.cfg.data, max_length=seq_len,
                                  batch_size=batch_size)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # synthetic fallback repeats
                dataset = registry.dataset[data_cfg.dataset](
                    self.exp.tokenizer, data_cfg)
            loader = ShardedLoader(dataset, batch_size, seed=self.cfg.data.seed,
                                   **self._host_slots())
            total += stage_steps
            res = self.run(steps=total, loader=loader)
            results.append(res)
        last = results[-1] if results else LoopResult({}, None)
        return last

    def run_resolution_stages(self) -> LoopResult:
        """Progressive resizing (reference ProgressiveResizing callback):
        stages of (resolution, steps); sequences are stride-subsampled at the
        collate level, so each stage re-jits at L/resolution while params and
        optimizer state carry across."""
        results = []
        total = 0
        for (resolution, stage_steps) in self.cfg.train.resolution_stages:
            self._log(f"stage: resolution={resolution} steps={stage_steps}")
            base = ShardedLoader(self.exp.dataset, self.cfg.data.batch_size,
                                 seed=self.cfg.data.seed, **self._host_slots())
            loader = TransformLoader(
                base, lambda b, r=resolution: subsample_batch(b, r))
            total += stage_steps
            results.append(self.run(steps=total, loader=loader))
        return results[-1] if results else LoopResult({}, None)
