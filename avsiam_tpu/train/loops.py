"""Epoch-level training/eval orchestration.

Parity targets:
* ``run_pretrain`` — traintest_cavmae_base.py:29-264: per-step two-pass
  update, loss meters + per-sample timing, NaN-divergence abort, per-epoch
  validation, per-epoch + best checkpoints, result.csv, optional linear probe.
* ``run_finetune`` — traintest_ft_base.py:29-290: stochastic-routing step,
  per-epoch validation (mAP or acc), best checkpoint, early stop after 3
  non-improving epochs, per-epoch stats pickle, optional end-of-run weight
  averaging (wa).
* ``validate_ft`` — traintest_ft_base.py:292-352 + validate_mlp
  (traintest_cavmae_base.py:426-492): eval-mode multi-frame forward ->
  sigmoid -> frame-mean -> calculate_stats.
* ``linear_probe`` — traintest_cavmae_base.py:266-378: fresh finetune model
  from the pretrain checkpoint, frozen base (base lr 5e-5, head lr 5e-3),
  5 epochs of 'joint_av', mAP/AUC for joint_av / audioonly / videoonly.
"""

from __future__ import annotations

import csv
import json
import os
import pickle
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avsiam_tpu.configs import FinetuneConfig, PretrainConfig, replace
from avsiam_tpu.data.dataset import (AVDataset, make_eval_transform,
                                     make_train_transform)
from avsiam_tpu.data.pipeline import device_loader
from avsiam_tpu.data.samplers import batched, eval_shard_indices, \
    shuffled_epoch_indices, weighted_indices
from avsiam_tpu.eval.metrics import AverageMeter, calculate_stats, mean_ap, \
    mean_auc
from avsiam_tpu.models.cavmae import CAVMAEPretrain
from avsiam_tpu.models.cavmae_ft import CAVMAEFinetune
from avsiam_tpu.train import finetune as ft
from avsiam_tpu.train import pretrain as pt
from avsiam_tpu.utils.checkpoint import (average_checkpoints,
                                         prune_train_states, save_params,
                                         transfer_pretrain_to_ft)


def _fetch(metrics: Dict) -> Dict[str, float]:
    return {k: float(v) for k, v in jax.device_get(metrics).items()}


_accum_metrics = jax.jit(lambda acc, m: jax.tree_util.tree_map(
    lambda a, x: a + x.astype(jnp.float32), acc, m))
_metrics_f32 = jax.jit(lambda m: jax.tree_util.tree_map(
    lambda x: x.astype(jnp.float32), m))


class _MetricWindow:
    """On-device accumulation of per-step metric sums between print points.

    The reference updates loss meters and NaN-checks EVERY step
    (traintest_cavmae_base.py:160-186). Fetching per step would force a host
    sync each step; instead the sums ride along on device (one tiny fused
    add per step) and are fetched at print cadence — meters then cover every
    step, and a NaN (which poisons the sum) aborts within one print window.
    """

    def __init__(self):
        self._sums = None
        self.steps = 0
        self.samples = 0
        self.data_time = 0.0
        self._start = time.time()

    def push(self, metrics, batch_size: int, data_t: float):
        self._sums = (_accum_metrics(self._sums, metrics)
                      if self._sums is not None else _metrics_f32(metrics))
        self.steps += 1
        self.samples += batch_size
        self.data_time += data_t

    def flush(self):
        """Fetch the window: (per-step averages, timing dict) or (None, {})."""
        if self.steps == 0:
            return None, {}
        sums = _fetch(self._sums)
        elapsed = time.time() - self._start
        avg = {k: v / self.steps for k, v in sums.items()}
        timing = {"elapsed": elapsed, "data": self.data_time,
                  "samples": self.samples}
        self._sums, self.steps, self.samples, self.data_time = None, 0, 0, 0.0
        self._start = time.time()
        return avg, timing


def _eval_params(params):
    """Multi-process eval runs host-locally: each process evaluates its
    contiguous slab with a LOCAL copy of the params, mirroring the
    reference's per-rank ``model.eval()`` over SequentialDistributedSampler
    slabs (traintest_ft_base.py:292-352). DP params are fully replicated on
    the global mesh, so ``device_get`` is addressable from every process.
    (TP params sharded across processes would need a gather first — the
    reference deployment is DP-only, SURVEY.md section 2.5.)"""
    if jax.process_count() == 1:
        return params
    return jax.device_get(params)


def _shard_state(state, mesh):
    """Place a train state onto a mesh: params follow the TP param rules
    (replicated when the 'model' axis is trivial — the reference's DP-only
    layout, SURVEY.md section 2.5); optimizer moments and step are
    replicated. GSPMD then derives the gradient psums/all-gathers from these
    placements alone.

    Multi-process: every process holds the identical full state (same seed
    init / same restored checkpoint), so each global array is assembled from
    the full local value via ``make_array_from_process_local_data`` with a
    replicated sharding — ``device_put`` cannot target non-addressable
    devices. DP-only across processes (the reference's deployment mode).
    """
    from avsiam_tpu.parallel.mesh import param_shardings, replicated
    repl = replicated(mesh)
    multiproc = jax.process_count() > 1
    if multiproc:
        assert mesh.shape["model"] == 1, (
            "multi-process runs are DP-only (model axis must be 1): params "
            "must be replicated so every process can assemble them locally")

    def put(x, sh):
        if multiproc:
            return jax.make_array_from_process_local_data(
                sh, np.asarray(jax.device_get(x)))
        return jax.device_put(x, sh)

    placed = {}
    for name, leaf_tree in state._asdict().items():
        if name == "params":
            placed[name] = jax.tree_util.tree_map(
                put, leaf_tree, param_shardings(mesh, leaf_tree))
        else:
            placed[name] = jax.tree_util.tree_map(
                lambda x: put(x, repl), leaf_tree)
    return type(state)(**placed)


def _epoch_loader(ds: AVDataset, cfg_batch: int, epoch: int, seed: int,
                  transform, rng, weights=None, frames_per_sample: int = 1,
                  sharding=None, train: bool = True):
    n = len(ds)
    pc, pi = jax.process_count(), jax.process_index()
    if train:
        # Rank-sharded sampling (torch DistributedSampler /
        # DistributedProxySampler under torchrun, run_pretrain_base.sh:75):
        # each process loads only ITS rows — the contiguous rank block of
        # every global batch — and the prefetcher assembles the global array
        # from the process-local shards (pipeline._put_batch).
        local_batch = cfg_batch if pc == 1 else cfg_batch // pc
        assert cfg_batch % pc == 0, (
            f"global batch {cfg_batch} not divisible by process count {pc}")
        if weights is not None:
            idx, pos = weighted_indices(weights, n, epoch, seed, world=pc,
                                        rank=pi, global_batch=cfg_batch,
                                        with_positions=True)
        else:
            idx, pos = shuffled_epoch_indices(n, epoch, seed, world=pc,
                                              rank=pi, global_batch=cfg_batch,
                                              with_positions=True)
        # positions (global epoch order) key per-sample augmentation RNG so
        # weighted sampling's repeated draws of one clip stay independent
        return device_loader(ds, batched(idx, local_batch, drop_last=True),
                             transform, rng, seed=seed + epoch,
                             frames_per_sample=frames_per_sample,
                             sharding=sharding, train=True,
                             position_batches=batched(pos, local_batch,
                                                      drop_last=True))
    else:
        # each host loads its contiguous padded slab; gathered outputs are
        # concatenated in process order and trimmed (SequentialDistributed-
        # Sampler semantics, parallel/dist.gather_eval_outputs). The slab is
        # further padded to a batch multiple (repeating the last index) so
        # every eval batch has ONE static shape — a ragged tail batch would
        # force a second XLA compile of the eval step. Multi-process eval
        # runs HOST-LOCALLY (each process evaluates its slab with local
        # params, exactly the reference's per-rank model.eval), so the
        # loader must not try to build global arrays: sharding=None.
        idx = eval_shard_indices(n, pc, pi)
        rem = len(idx) % cfg_batch
        if rem:
            idx = np.concatenate([idx, np.full(cfg_batch - rem, idx[-1])])
        if pc > 1:
            sharding = None
        return device_loader(ds, batched(idx, cfg_batch, drop_last=False),
                             transform, rng, seed=seed + epoch,
                             frames_per_sample=frames_per_sample,
                             sharding=sharding, train=False)


# ---------------------------------------------------------------------------
# Pretraining
# ---------------------------------------------------------------------------

def run_pretrain(cfg: PretrainConfig, train_ds: AVDataset,
                 val_ds: Optional[AVDataset] = None,
                 probe_train_ds: Optional[AVDataset] = None,
                 probe_val_ds: Optional[AVDataset] = None,
                 probe_n_class: int = 527, init_params=None,
                 balance_weights=None, mesh=None, sharding=None,
                 max_steps_per_epoch: Optional[int] = None,
                 resume: bool = False, log: Callable = print) -> Dict:
    from avsiam_tpu.utils.checkpoint import (restore_train_state,
                                             save_train_state)
    model = CAVMAEPretrain(cfg.model)
    rng = jax.random.PRNGKey(cfg.seed)
    sample = train_ds.batch([0, 1], np.random.RandomState(0))
    transform = make_train_transform(cfg.audio, im_res=cfg.model.vit.img_size)
    fb, img, _ = transform(rng, *sample)
    state = pt.init_state(rng, model, cfg, (fb[:2], img[:2]))
    if init_params is not None:
        # timm-ViT / checkpoint initialization (the reference's default start,
        # cav_mae_base.py:236-303); a --resume below still overrides it.
        state = state._replace(params=init_params)
    start_epoch = 1
    if resume:
        latest = _latest_train_state_epoch(cfg.exp_dir)
        if latest is not None:
            state = restore_train_state(cfg.exp_dir,
                                        f"train_state.{latest}", state)
            start_epoch = latest + 1
            log(f"resumed from epoch {latest}")
    if mesh is not None:
        from avsiam_tpu.parallel.mesh import batch_sharding
        n_data = mesh.shape["data"]
        assert cfg.batch_size % n_data == 0, (
            f"global batch {cfg.batch_size} not divisible by mesh data "
            f"axis {n_data}")
        state = _shard_state(state, mesh)
        sharding = batch_sharding(mesh)
    step_fn = pt.make_pretrain_step(model, cfg)
    eval_fn = pt.make_eval_step(model, cfg)

    from avsiam_tpu.parallel.dist import is_main_process
    main = is_main_process()  # rank-0-only plain-file writes (reference
    # gates ckpt/csv saves on rank 0, traintest_cavmae_base.py:223-234);
    # orbax saves stay collective — every process calls them, orbax's
    # primary-host handler does the actual write.
    os.makedirs(os.path.join(cfg.exp_dir, "models"), exist_ok=True)
    from avsiam_tpu.utils.logging import MetricsLogger
    mlog = MetricsLogger(cfg.exp_dir)
    result_rows, progress = _resume_history(cfg.exp_dir, start_epoch)
    start_time = time.time()
    best_loss, best_epoch = np.inf, 0
    for r in result_rows:  # restore the best-ckpt decision state on resume
        if r.get("eval_loss", np.inf) < best_loss:
            best_loss, best_epoch = r["eval_loss"], int(r["epoch"])
    sched = None
    if cfg.opt.lr_adapt:
        # ReduceLROnPlateau stepped on -eval_loss after each epoch's
        # validation (traintest_cavmae_base.py:69-71,236-237); replaces
        # MultiStepLR entirely. Resume replays restored epochs' metric feed
        # so the scheduler state (best / bad-epoch count / lr) is restored.
        from avsiam_tpu.train.optim import plateau_scheduler
        sched = plateau_scheduler(cfg.opt)
        for r in result_rows:
            if "eval_loss" in r:
                sched.step(-r["eval_loss"])
        if val_ds is None:
            log("warning: --lr_adapt True without --data-val: the plateau "
                "scheduler never sees a metric, so lr stays constant at "
                f"{cfg.opt.lr} (MultiStepLR would still decay on schedule)")
    meters = {k: AverageMeter() for k in
              ("loss", "loss_mae_a", "loss_mae_v", "loss_c", "per_sample_time",
               "per_sample_data_time", "per_sample_dnn_time")}
    # continue the restored run's step numbering (metrics series alignment)
    global_step = int(jax.device_get(state.step))

    for epoch in range(start_epoch, cfg.n_epochs + 1):
        for meter in meters.values():  # per-epoch reset (reference :256-264)
            meter.reset()
        lr = sched.lr if sched is not None else pt.lr_for_epoch(cfg, epoch)
        loader = _epoch_loader(train_ds, cfg.batch_size, epoch, cfg.seed,
                               transform, jax.random.fold_in(rng, epoch),
                               weights=balance_weights, sharding=sharding)

        def flush_window(win) -> Optional[Dict[str, float]]:
            avg, t = win.flush()
            if avg is None:
                return None
            for k in ("loss", "loss_mae_a", "loss_mae_v", "loss_c"):
                meters[k].update(avg[k], t["samples"])
            meters["per_sample_time"].update(
                t["elapsed"] / t["samples"], t["samples"])
            meters["per_sample_data_time"].update(
                t["data"] / t["samples"], t["samples"])
            meters["per_sample_dnn_time"].update(
                (t["elapsed"] - t["data"]) / t["samples"], t["samples"])
            return avg

        window = _MetricWindow()
        end_time = time.time()
        for i, (a, v, _) in enumerate(loader):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            data_t = time.time() - end_time
            state, metrics = step_fn(state, (a, v), rng, jnp.float32(lr))
            window.push(metrics, a.shape[0], data_t)
            if (global_step % cfg.n_print_steps == 0) or i == 0:
                m = flush_window(window)
                log(f"Epoch [{epoch}][{i}] loss {m['loss']:.4f} "
                    f"mae_a {m['loss_mae_a']:.4f} mae_v {m['loss_mae_v']:.4f} "
                    f"c {m['loss_c']:.4f} c_acc {m['c_acc']:.3f} "
                    f"t/sample {meters['per_sample_time'].avg * 1000:.1f}ms")
                mlog.log({"epoch": epoch, **m}, step=global_step)
                if np.isnan(meters["loss"].avg):
                    log("training diverged...")
                    return {"diverged": True, "epoch": epoch}
            global_step += 1
            end_time = time.time()
        # tail flush: epoch meters (and result.csv below) cover EVERY step
        flush_window(window)
        if np.isnan(meters["loss"].avg):
            log("training diverged...")
            return {"diverged": True, "epoch": epoch}

        row = {"epoch": epoch, "lr": lr,
               **{k: meters[k].avg for k in
                  ("loss", "loss_mae_a", "loss_mae_v", "loss_c")}}
        # --val_interval: skipped epochs omit the eval_* columns entirely
        # (result.csv stays well-formed; resume/plateau replay both key on
        # the presence of eval_loss). The final epoch always validates.
        if val_ds is not None and (
                epoch % max(cfg.val_interval, 1) == 0
                or epoch == cfg.n_epochs):
            row.update(validate_pretrain(eval_fn, state.params, val_ds, cfg,
                                         sharding=sharding,
                                         max_steps=max_steps_per_epoch))
            log(f"Eval epoch {epoch}: " + json.dumps(
                {k: round(v, 5) for k, v in row.items()}))
            if row.get("eval_loss", np.inf) < best_loss:
                best_loss, best_epoch = row["eval_loss"], epoch
                save_params(cfg.exp_dir, "best_audio_model", state.params)
            if sched is not None and "eval_loss" in row:
                # guard: a val slab that rounds to zero batches yields an
                # empty row (same reason the best-ckpt check uses .get)
                sched.step(-row["eval_loss"])  # cavmae_base.py:236-237
        if probe_train_ds is not None and probe_val_ds is not None:
            # per-epoch linear probe (traintest_cavmae_base.py:250-252)
            probe = linear_probe(state.params, cfg, probe_train_ds,
                                 probe_val_ds, n_class=probe_n_class,
                                 max_steps_per_epoch=max_steps_per_epoch,
                                 mesh=mesh, log=log)
            row.update({f"probe_{k}": v for k, v in probe.items()})
        if cfg.save_model:  # --save_model gate (traintest_cavmae_base.py:232)
            save_params(cfg.exp_dir, f"audio_model.{epoch}", state.params)
        if epoch % max(cfg.train_state_every, 1) == 0 or epoch == cfg.n_epochs:
            save_train_state(cfg.exp_dir, f"train_state.{epoch}", state)
            if main:
                prune_train_states(cfg.exp_dir, cfg.keep_train_states)
        result_rows.append(row)
        mlog.log(row, step=global_step)
        if main:
            _write_csv(os.path.join(cfg.exp_dir, "result.csv"), result_rows)
            # progress.pkl parity (traintest_cavmae_base.py:47-51)
            progress.append([epoch, global_step, best_epoch, best_loss,
                             time.time() - start_time])
            with open(os.path.join(cfg.exp_dir, "progress.pkl"), "wb") as f:
                pickle.dump(progress, f)

    return {"state": state, "best_epoch": best_epoch, "rows": result_rows,
            "model": model}


def _latest_train_state_epoch(exp_dir: str) -> Optional[int]:
    mdir = os.path.join(exp_dir, "models")
    if not os.path.isdir(mdir):
        return None
    epochs = [int(n.split(".")[1]) for n in os.listdir(mdir)
              if n.startswith("train_state.")]
    return max(epochs) if epochs else None


def validate_pretrain(eval_fn, params, val_ds: AVDataset, cfg: PretrainConfig,
                      sharding=None, max_steps: Optional[int] = None) -> Dict:
    transform = make_eval_transform(cfg.audio, im_res=cfg.model.vit.img_size, single_frame=True)
    loader = _epoch_loader(val_ds, cfg.batch_size, 0, cfg.seed, transform,
                           jax.random.PRNGKey(0), sharding=sharding,
                           train=False)
    params = _eval_params(params)
    sums, n = {}, 0
    for i, (a, v, _) in enumerate(loader):
        if max_steps and i >= max_steps:
            break
        m = _fetch(eval_fn(params, (a, v), jax.random.PRNGKey(i)))
        for k, val in m.items():
            sums[k] = sums.get(k, 0.0) + val
        n += 1
    out = {f"eval_{k}": v / max(n, 1) for k, v in sums.items()}
    # cross-process mean: every rank evaluated a different slab, but the
    # best-checkpoint decision keyed on eval_loss must be identical on all
    # ranks (orbax saves are collective)
    from avsiam_tpu.parallel.dist import average_across_processes
    return average_across_processes(out)


# ---------------------------------------------------------------------------
# Finetuning
# ---------------------------------------------------------------------------

def run_finetune(cfg: FinetuneConfig, train_ds: AVDataset,
                 val_ds: Optional[AVDataset] = None,
                 init_params=None, balance_weights=None,
                 mesh=None, sharding=None,
                 max_steps_per_epoch: Optional[int] = None,
                 wa: bool = False, wa_start: int = 1, wa_end: int = 5,
                 resume: bool = False, log: Callable = print) -> Dict:
    from avsiam_tpu.utils.checkpoint import (restore_train_state,
                                             save_train_state)
    if wa and not cfg.save_model:
        # fail BEFORE training: averaging restores the per-epoch
        # audio_model.{e} checkpoints (run_cavmae_ft_base.py:169-180) that
        # --save_model False never writes — catching this after n_epochs of
        # compute would waste the whole run
        raise ValueError("--wa True requires --save_model True (weight "
                         "averaging reads the per-epoch checkpoints)")
    model = CAVMAEFinetune(cfg.model)
    rng = jax.random.PRNGKey(cfg.seed)
    sample = train_ds.batch([0, 1], np.random.RandomState(0))
    transform = make_train_transform(cfg.audio, im_res=cfg.model.vit.img_size)
    fb, img, y = transform(rng, *sample)
    state = ft.init_state(rng, model, cfg, (fb[:2], img[:2, None], y[:2]))
    if init_params is not None:
        state = state._replace(params=init_params)
    start_epoch = 1
    if resume:
        latest = _latest_train_state_epoch(cfg.exp_dir)
        if latest is not None:
            state = restore_train_state(cfg.exp_dir,
                                        f"train_state.{latest}", state)
            start_epoch = latest + 1
            log(f"resumed from epoch {latest}")
    if mesh is not None:
        from avsiam_tpu.parallel.mesh import batch_sharding
        n_data = mesh.shape["data"]
        assert cfg.batch_size % n_data == 0, (
            f"global batch {cfg.batch_size} not divisible by mesh data "
            f"axis {n_data}")
        state = _shard_state(state, mesh)
        sharding = batch_sharding(mesh)
    step_fn = ft.make_finetune_step(model, cfg)
    eval_fn = ft.make_ft_eval_step(model, cfg)

    from avsiam_tpu.parallel.dist import is_main_process
    main = is_main_process()  # rank-0-only plain-file writes; orbax saves
    # stay collective (see run_pretrain)
    os.makedirs(os.path.join(cfg.exp_dir, "models"), exist_ok=True)
    from avsiam_tpu.utils.logging import MetricsLogger
    mlog = MetricsLogger(cfg.exp_dir)
    best_metric, best_epoch, non_improving = -np.inf, 0, 0
    rows, _ = _resume_history(cfg.exp_dir, start_epoch)
    metric_key = "mAP" if cfg.metrics == "mAP" else "acc"
    for r in rows:  # restore best-ckpt decision state on resume
        if r.get(metric_key, -np.inf) > best_metric:
            best_metric, best_epoch = r[metric_key], int(r["epoch"])
    sched = None
    if cfg.opt.lr_adapt:
        # ReduceLROnPlateau(mode='max') stepped on the main eval metric
        # after each epoch (traintest_ft_base.py:99-100,266-270); resume
        # replays restored epochs to rebuild scheduler state.
        from avsiam_tpu.train.optim import plateau_scheduler
        sched = plateau_scheduler(cfg.opt)
        for r in rows:
            if metric_key in r:
                sched.step(r[metric_key])
        if val_ds is None:
            log("warning: --lr_adapt True without --data-val: the plateau "
                "scheduler never sees a metric, so lr stays constant at "
                f"{cfg.opt.lr} (MultiStepLR would still decay on schedule)")
    global_step = int(jax.device_get(state.step))
    # FT loop meters the same per-sample total/data/DNN split as pretrain
    # (traintest_ft_base.py:117-147 mirrors traintest_cavmae_base.py:118-120)
    meters = {k: AverageMeter() for k in
              ("loss", "per_sample_time", "per_sample_data_time",
               "per_sample_dnn_time")}

    for epoch in range(start_epoch, cfg.n_epochs + 1):
        for meter in meters.values():  # per-epoch reset (reference parity)
            meter.reset()
        lr = sched.lr if sched is not None else ft.lr_for_epoch(cfg, epoch)
        loader = _epoch_loader(train_ds, cfg.batch_size, epoch, cfg.seed,
                               transform, jax.random.fold_in(rng, epoch),
                               weights=balance_weights, sharding=sharding)

        def flush_window(win) -> Optional[Dict[str, float]]:
            avg, t = win.flush()
            if avg is None:
                return None
            meters["loss"].update(avg["loss"], t["samples"])
            meters["per_sample_time"].update(
                t["elapsed"] / t["samples"], t["samples"])
            meters["per_sample_data_time"].update(
                t["data"] / t["samples"], t["samples"])
            meters["per_sample_dnn_time"].update(
                (t["elapsed"] - t["data"]) / t["samples"], t["samples"])
            return avg

        window = _MetricWindow()
        end_time = time.time()
        for i, (a, v, y) in enumerate(loader):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            data_t = time.time() - end_time
            if v.ndim == 4:
                v = v[:, None]
            state, metrics = step_fn(state, (a, v, y), rng, jnp.float32(lr))
            window.push(metrics, a.shape[0], data_t)
            if global_step % cfg.n_print_steps == 0:
                m = flush_window(window)
                log(f"FT epoch [{epoch}][{i}] loss {m['loss']:.4f} "
                    f"t/sample {meters['per_sample_time'].avg * 1000:.1f}ms")
                if np.isnan(meters["loss"].avg):
                    log("training diverged...")
                    return {"diverged": True, "epoch": epoch}
            global_step += 1
            end_time = time.time()
        flush_window(window)  # tail: epoch meters cover every step
        if np.isnan(meters["loss"].avg):
            log("training diverged...")
            return {"diverged": True, "epoch": epoch}

        row = {"epoch": epoch, "lr": lr, "train_loss": meters["loss"].avg,
               **{k: meters[k].avg for k in
                  ("per_sample_time", "per_sample_data_time",
                   "per_sample_dnn_time")}}
        if val_ds is not None:
            stats, val_loss = validate_ft(
                eval_fn, state.params, val_ds, cfg, sharding=sharding,
                max_steps=max_steps_per_epoch)
            mAP, mAUC = mean_ap(stats), mean_auc(stats)
            acc = stats[0]["acc"]
            row.update({"mAP": mAP, "mAUC": mAUC, "acc": acc,
                        "val_loss": val_loss})
            metric = mAP if cfg.metrics == "mAP" else acc
            log(f"FT eval epoch {epoch}: mAP {mAP:.4f} AUC {mAUC:.4f} "
                f"acc {acc:.4f}")
            if main:
                with open(os.path.join(cfg.exp_dir, f"stats_{epoch}.pickle"),
                          "wb") as f:
                    pickle.dump(stats, f)
            if metric > best_metric:
                best_metric, best_epoch, non_improving = metric, epoch, 0
                save_params(cfg.exp_dir, "best_audio_model", state.params)
            else:
                non_improving += 1
            if sched is not None:
                sched.step(metric)  # traintest_ft_base.py:266-270
        if cfg.save_model:  # --save_model gate (traintest_ft_base.py:262)
            save_params(cfg.exp_dir, f"audio_model.{epoch}", state.params)
        if epoch % max(cfg.train_state_every, 1) == 0 or epoch == cfg.n_epochs:
            save_train_state(cfg.exp_dir, f"train_state.{epoch}", state)
            if main:
                prune_train_states(cfg.exp_dir, cfg.keep_train_states)
        rows.append(row)
        mlog.log(row, step=global_step)
        if main:
            _write_csv(os.path.join(cfg.exp_dir, "result.csv"), rows)
        if non_improving >= 3:  # traintest_ft_base.py:249-251
            log("early stop")
            if epoch % max(cfg.train_state_every, 1) != 0:
                # keep the 'final epoch always saved' resume guarantee
                # (cli/common.py --train_state_every) across the early exit
                save_train_state(cfg.exp_dir, f"train_state.{epoch}", state)
                if main:
                    prune_train_states(cfg.exp_dir, cfg.keep_train_states)
            break

    out = {"state": state, "best_epoch": best_epoch, "best": best_metric,
           "rows": rows, "model": model}
    if wa:
        # clamp to the last epoch that actually has a checkpoint — rows
        # carry explicit epoch numbers (len(rows) would undercount after a
        # resume, and an already-complete resumed run has no new rows)
        last = max((int(r["epoch"]) for r in rows), default=0)
        end = min(wa_end, last)
        if end >= wa_start:
            out["wa_params"] = average_checkpoints(cfg.exp_dir, wa_start,
                                                   end, like=state.params)
        else:
            log(f"wa skipped: no checkpoints in [{wa_start}, {end}]")
    return out


def _np_sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _np_bce(logits: np.ndarray, y: np.ndarray) -> float:
    """numpy twin of ft.bce_with_logits (informational eval loss only)."""
    x = logits.astype(np.float32)
    return float(np.mean(np.maximum(x, 0) - x * y
                         + np.log1p(np.exp(-np.abs(x)))))


def _np_ce_soft(logits: np.ndarray, y: np.ndarray) -> float:
    """numpy twin of ft.ce_with_soft_targets."""
    x = logits.astype(np.float32)
    z = x - x.max(axis=-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
    return float(-np.mean((y * logp).sum(axis=-1)))


def validate_ft(eval_fn, params, val_ds: AVDataset, cfg: FinetuneConfig,
                sharding=None, max_steps: Optional[int] = None):
    """Eval loop: multi-frame forward -> sigmoid -> frame mean ->
    calculate_stats (traintest_ft_base.py:292-352)."""
    transform = make_eval_transform(cfg.audio, im_res=cfg.model.vit.img_size)
    frames = cfg.model.num_eval_frames
    loader = _epoch_loader(val_ds, cfg.batch_size, 0, cfg.seed, transform,
                           jax.random.PRNGKey(0), frames_per_sample=frames,
                           sharding=sharding, train=False)
    params = _eval_params(params)
    preds, targets, losses = [], [], []
    np_loss = _np_bce if cfg.loss == "BCE" else _np_ce_soft
    for i, (a, v, y) in enumerate(loader):
        if max_steps and i >= max_steps:
            break
        logits = eval_fn(params, (a, v, y))
        # everything after the forward is host-side numpy: re-dispatching
        # sigmoid/mean/loss per batch costs ~2 ms/dispatch (CLAUDE.md)
        logits = np.asarray(jax.device_get(logits), dtype=np.float32)
        y = np.asarray(jax.device_get(y), dtype=np.float32)
        if logits.ndim == 3:  # [B, T, C] multi-frame
            p = _np_sigmoid(logits).mean(axis=1)
            losses.append(np_loss(logits.mean(axis=1), y))
        else:
            p = _np_sigmoid(logits)
            losses.append(np_loss(logits, y))
        preds.append(p)
        targets.append(y)
    from avsiam_tpu.data.samplers import eval_shard_indices
    from avsiam_tpu.parallel.dist import gather_eval_outputs
    # drop this rank's batch-alignment padding before the ordered gather
    slab = len(eval_shard_indices(len(val_ds), jax.process_count(),
                                  jax.process_index()))
    output = gather_eval_outputs(np.concatenate(preds)[:slab], len(val_ds))
    target = gather_eval_outputs(np.concatenate(targets)[:slab], len(val_ds))
    stats = calculate_stats(output, target)
    # NOTE: val_loss is a per-rank, padding-inclusive batch mean — it matches
    # the reference's own loose loss accounting (traintest_ft_base.py:327-333)
    # and is NOT gathered across hosts; only the mAP path dedupes padding.
    # Do not compare val_loss across world sizes.
    return stats, float(np.mean(losses))


# ---------------------------------------------------------------------------
# Linear probe (pretraining-time quality signal)
# ---------------------------------------------------------------------------

def linear_probe(pretrain_params, pre_cfg: PretrainConfig,
                 probe_train_ds: AVDataset, probe_val_ds: AVDataset,
                 n_class: int = 527, epochs: int = 5,
                 max_steps_per_epoch: Optional[int] = None,
                 mesh=None, log: Callable = print) -> Dict:
    """traintest_cavmae_base.py:266-378: fresh FT model from pretrain params,
    frozen base, Adam(head 5e-3), 'joint_av' training, 3-mode eval."""
    from avsiam_tpu.configs import CAVMAEFTConfig
    ft_cfg = FinetuneConfig(
        model=CAVMAEFTConfig(vit=pre_cfg.model.vit, label_dim=n_class,
                             dtype=pre_cfg.model.dtype),
        audio=replace(pre_cfg.audio, freqm=0, timem=0, mixup=0.0, noise=False),
        opt=replace(pre_cfg.opt, lr=5e-5), head_lr=100.0, mm_lr=100.0,
        freeze_base=True, ftmode="joint_av", batch_size=pre_cfg.batch_size,
        n_epochs=epochs, exp_dir=os.path.join(pre_cfg.exp_dir, "probe"),
        seed=pre_cfg.seed)
    model = CAVMAEFinetune(ft_cfg.model)
    rng = jax.random.PRNGKey(ft_cfg.seed)
    sample = probe_train_ds.batch([0, 1], np.random.RandomState(0))
    transform = make_train_transform(ft_cfg.audio, im_res=ft_cfg.model.vit.img_size)
    fb, img, y = transform(rng, *sample)
    state = ft.init_state(rng, model, ft_cfg, (fb[:2], img[:2, None], y[:2]))
    state = state._replace(params=transfer_pretrain_to_ft(
        jax.device_get(pretrain_params), jax.device_get(state.params)))
    sharding = None
    if mesh is not None:
        # probe over the same mesh as the main loop: multi-process runs
        # feed rank-sharded global batches, which need sharded state
        from avsiam_tpu.parallel.mesh import batch_sharding
        state = _shard_state(state, mesh)
        sharding = batch_sharding(mesh)
    step_fn = ft.make_finetune_step(model, ft_cfg)

    for epoch in range(1, epochs + 1):
        loader = _epoch_loader(probe_train_ds, ft_cfg.batch_size, epoch,
                               ft_cfg.seed, transform,
                               jax.random.fold_in(rng, epoch),
                               sharding=sharding)
        for i, (a, v, y) in enumerate(loader):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            if v.ndim == 4:
                v = v[:, None]
            state, metrics = step_fn(state, (a, v, y), rng,
                                     jnp.float32(ft_cfg.opt.lr))

    results = {}
    # eval exactly what the reference's probe evaluates:
    # traintest_cavmae_base.py:343-354 runs joint_av / audioonly / videoonly
    for mode in ("joint_av", "audioonly", "videoonly"):
        mode_cfg = replace(ft_cfg, ftmode=mode)
        eval_fn = ft.make_ft_eval_step(model, mode_cfg)
        stats, _ = validate_ft(eval_fn, state.params, probe_val_ds, mode_cfg,
                               max_steps=max_steps_per_epoch)
        results[f"{mode}_mAP"] = mean_ap(stats)
        results[f"{mode}_AUC"] = mean_auc(stats)
        log(f"linear probe {mode}: mAP {results[f'{mode}_mAP']:.4f}")
    return results


def _write_csv(path: str, rows: List[Dict]):
    keys = sorted({k for r in rows for k in r})
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)


def _read_csv(path: str) -> List[Dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path, newline="") as f:
        for r in csv.DictReader(f):
            row = {}
            for k, v in r.items():
                if v is None or v == "":
                    continue
                try:
                    fv = float(v)
                    row[k] = int(fv) if k == "epoch" else fv
                except ValueError:
                    row[k] = v
            out.append(row)
    return out


def _resume_history(exp_dir: str, start_epoch: int):
    """Reload prior epochs' result rows and progress so a resumed run
    appends to its history instead of rewriting result.csv/progress.pkl
    from empty (which would erase pre-crash epochs)."""
    if start_epoch <= 1:
        return [], []
    rows = [r for r in _read_csv(os.path.join(exp_dir, "result.csv"))
            if r.get("epoch", 0) < start_epoch]
    progress = []
    ppath = os.path.join(exp_dir, "progress.pkl")
    if os.path.exists(ppath):
        with open(ppath, "rb") as f:
            progress = [p for p in pickle.load(f) if p[0] < start_epoch]
    return rows, progress
