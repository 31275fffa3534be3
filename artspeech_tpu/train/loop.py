"""Unified training orchestration for articulation models.

Host-side scaffold equivalent to reference train_phoneme_to_articulation.py:
124-426 (epoch loop, ReduceLROnPlateau, early stopping on valid P2CP-mm,
best/last checkpointing, metric logging), around the jitted steps in
artspeech_tpu.train.step. The jitted step is compiled once per bucket
signature; LR changes mutate optimizer hyperparams without recompiling.
"""

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax
import numpy as np

from artspeech_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    save_params,
)
from artspeech_tpu.train.state import (
    EarlyStopping,
    PlateauScheduler,
    TrainState,
    get_learning_rate,
)


def _batch_weight(meta) -> float:
    """Real sentences in a collated batch (dummy pad rows excluded).

    Epoch means weight each batch by this, so partially-filled final
    buckets do not bias the reported (and best-model-selecting) metrics.
    """
    if isinstance(meta, dict):
        n = meta.get("n_real", meta.get("n_valid"))
        if n is not None:
            return float(n)
        names = meta.get("sentence_names")
        if names is not None:
            return float(len(names))
    return 1.0


def run_train_epoch(
    state, loader, train_step, rng, sharding=None
) -> (object, Dict[str, float]):
    """One training epoch; returns (state, sentence-weighted mean metrics)."""
    from artspeech_tpu.data.batching import prefetch_to_device

    sums, total_w = {}, 0.0
    for batch, meta in prefetch_to_device(loader, sharding=sharding):
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, batch, step_rng)
        w = _batch_weight(meta)
        total_w += w
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + w * v
    means = {k: float(v) / max(total_w, 1.0) for k, v in jax.device_get(sums).items()}
    return state, means


def run_eval_epoch(state, loader, eval_step, sharding=None) -> Dict[str, float]:
    from artspeech_tpu.data.batching import prefetch_to_device

    sums, total_w = {}, 0.0
    for batch, meta in prefetch_to_device(loader, sharding=sharding):
        metrics, _ = eval_step(state, batch)
        w = _batch_weight(meta)
        total_w += w
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + w * v
    return {k: float(v) / max(total_w, 1.0) for k, v in jax.device_get(sums).items()}


@dataclass
class FitResult:
    state: object
    best_metric: float
    best_params_dir: str
    last_epoch: int
    history: list = field(default_factory=list)


def fit(
    state,
    train_loader,
    valid_loader,
    train_step: Callable,
    eval_step: Callable,
    n_epochs: int,
    checkpoints_dir: str,
    monitor: str = "p2cp_mm",
    patience: int = 30,
    scheduler: Optional[PlateauScheduler] = None,
    tracker=None,
    seed: int = 0,
    resume: bool = False,
    resume_from: Optional[str] = None,
    epoch_callback: Optional[Callable] = None,
    mesh="auto",
    train_step_factory: Optional[Callable] = None,
) -> FitResult:
    """Full training run with plateau LR, early stopping and checkpoints.

    Layout under ``checkpoints_dir``: best/ (state at best valid metric),
    last/ (rolling resume checkpoint + aux.json scheduler state).
    ``resume_from`` restores a specific checkpoint directory (the CLI
    --checkpoint path, reference train_phoneme_to_articulation.py:240-249);
    plain ``resume`` restores the rolling last/ checkpoint.

    Training is data-parallel by default: ``mesh="auto"`` builds a dp mesh
    over the local devices that evenly divide the loader's collated batch
    size (a 1-device mesh on a single chip — no regression), replicates the
    state onto it and shards every batch over the ``data`` axis. Pass an
    explicit Mesh (e.g. with a model axis) or ``mesh=None`` to disable.

    ``train_step_factory(mesh) -> train_step`` lets the step see the
    RESOLVED mesh (overrides ``train_step``, which may then be None): the
    ArtSpeech family uses it to build the manual-SPMD (shard_map) step
    variant when ``prefer_manual_spmd`` holds — the only dp path under
    which the fused Pallas recurrence kernels dispatch (train/step.py).
    """
    from artspeech_tpu.parallel.distributed import distribute_state
    from artspeech_tpu.parallel.mesh import batch_sharding, data_parallel_mesh

    if mesh == "auto":
        collate_bs = getattr(
            train_loader, "collate_batch_size", getattr(train_loader, "batch_size", None)
        )
        mesh = data_parallel_mesh(collate_bs)
    if train_step_factory is not None:
        train_step = train_step_factory(mesh)
    sharding = batch_sharding(mesh) if mesh is not None else None
    os.makedirs(checkpoints_dir, exist_ok=True)
    best_dir = os.path.join(checkpoints_dir, "best")
    last_dir = os.path.join(checkpoints_dir, "last")
    scheduler = scheduler or PlateauScheduler()
    stopper = EarlyStopping(patience=patience)
    start_epoch = 0

    restore_dir = None
    if resume_from is not None:
        if not os.path.isdir(os.path.join(resume_from, "state")):
            raise FileNotFoundError(
                f"--checkpoint path has no train state: {resume_from}"
            )
        restore_dir = resume_from
    elif resume and os.path.isdir(os.path.join(last_dir, "state")):
        restore_dir = last_dir
    if restore_dir is not None:
        state, aux = restore_checkpoint(restore_dir, state)
        if aux:
            start_epoch = int(aux.get("epoch", -1)) + 1
            stopper.best_metric = float(aux.get("best_metric", float("inf")))
            stopper.epochs_since_best = int(aux.get("epochs_since_best", 0))
            scheduler.best = float(aux.get("scheduler_best", float("inf")))
            scheduler.bad_epochs = int(aux.get("scheduler_bad_epochs", 0))

    if mesh is not None:
        state = distribute_state(state, mesh)

    rng = jax.random.PRNGKey(seed)
    history = []
    epoch = start_epoch - 1
    for epoch in range(start_epoch, n_epochs):
        rng, epoch_rng = jax.random.split(rng)
        state, train_metrics = run_train_epoch(
            state, train_loader, train_step, epoch_rng, sharding=sharding
        )
        valid_metrics = run_eval_epoch(state, valid_loader, eval_step, sharding=sharding)
        monitored = valid_metrics[monitor]

        state = scheduler.step(valid_metrics.get("loss", monitored), state)
        is_best = stopper.update(monitored)

        record = {
            "epoch": epoch,
            "lr": get_learning_rate(state),
            **{f"train_{k}": v for k, v in train_metrics.items()},
            **{f"valid_{k}": v for k, v in valid_metrics.items()},
            "best": is_best,
        }
        history.append(record)
        if tracker is not None:
            tracker.log_metrics(
                {k: v for k, v in record.items() if k != "best"}, step=epoch
            )

        if is_best:
            save_checkpoint(best_dir, state, aux={"epoch": epoch, monitor: monitored})
            # Model-only artifact (reference best_model.pt: a bare state
            # dict, train_phoneme_to_articulation.py:295-301).
            save_params(os.path.join(checkpoints_dir, "best_model"), state.params)
        save_checkpoint(
            last_dir,
            state,
            aux={
                "epoch": epoch,
                "best_metric": stopper.best_metric,
                "epochs_since_best": stopper.epochs_since_best,
                "scheduler_best": scheduler.best,
                "scheduler_bad_epochs": scheduler.bad_epochs,
            },
        )
        if epoch_callback is not None:
            epoch_callback(epoch, state, record)
        if stopper.should_stop:
            break

    # A resumed run may complete zero epochs (or never improve): downstream
    # always needs a best checkpoint in THIS run's directory.
    if not os.path.isdir(os.path.join(best_dir, "state")):
        save_checkpoint(best_dir, state, aux={"epoch": epoch, monitor: stopper.best_metric})
        save_params(os.path.join(checkpoints_dir, "best_model"), state.params)

    return FitResult(
        state=state,
        best_metric=stopper.best_metric,
        best_params_dir=best_dir,
        last_epoch=epoch,
        history=history,
    )
