"""Train state, optimizer factory and plateau LR scheduling.

Mirrors the reference training scaffold (train_phoneme_to_articulation.py:
Adam + ReduceLROnPlateau(factor=0.1, patience=10) + early stopping on the
valid P2CP), rebuilt on optax. The plateau scheduler is host-side state that
rescales an injected learning-rate hyperparameter — the jitted step never
recompiles when the LR changes.
"""

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Flax TrainState; loss-specific extras ride in ``extra``."""

    extra: Any = None


def make_optimizer(learning_rate: float, weight_decay: float = 0.0):
    """Adam with decoupled weight decay, LR injected as mutable hyperparam.

    Reference uses ``torch.optim.Adam(lr, weight_decay=wd)`` — torch's Adam
    weight decay is L2-into-gradient; ``optax.adamw`` decoupled decay at these
    tiny decay values (1e-5) is metric-equivalent and the better default.
    """
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )


def create_train_state(
    model,
    rng,
    sample_args: tuple,
    learning_rate: float,
    weight_decay: float = 0.0,
    extra: Any = None,
) -> TrainState:
    params = model.init(rng, *sample_args)["params"]
    tx = make_optimizer(learning_rate, weight_decay)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, extra=extra
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Overwrite the injected learning rate inside the optimizer state."""
    opt_state = state.opt_state
    # inject_hyperparams wraps state in InjectStatefulHyperparamsState
    hyperparams = dict(opt_state.hyperparams)
    new_lr = jnp.asarray(lr, dtype=jnp.float32)
    # Keep the old value's sharding (distributed state) so the jitted step
    # signature is unchanged and an LR drop does not trigger a recompile.
    old = hyperparams.get("learning_rate")
    if hasattr(old, "sharding"):
        new_lr = jax.device_put(new_lr, old.sharding)
    hyperparams["learning_rate"] = new_lr
    opt_state = opt_state._replace(hyperparams=hyperparams)
    return state.replace(opt_state=opt_state)


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


@dataclass
class PlateauScheduler:
    """ReduceLROnPlateau equivalent (torch defaults: factor 0.1, patience 10)."""

    factor: float = 0.1
    patience: int = 10
    min_lr: float = 0.0
    best: float = float("inf")
    bad_epochs: int = 0

    def step(self, metric: float, state: TrainState) -> TrainState:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
            return state
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            new_lr = max(get_learning_rate(state) * self.factor, self.min_lr)
            state = set_learning_rate(state, new_lr)
        return state


@dataclass
class EarlyStopping:
    """Best-metric tracking + patience (reference
    train_phoneme_to_articulation.py:292-321)."""

    patience: int = 30
    best_metric: float = field(default=float("inf"))
    epochs_since_best: int = 0

    def update(self, metric: float) -> bool:
        """Returns True if this epoch is a new best."""
        if metric < self.best_metric:
            self.best_metric = metric
            self.epochs_since_best = 0
            return True
        self.epochs_since_best += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.epochs_since_best > self.patience


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
