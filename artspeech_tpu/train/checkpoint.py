"""Checkpoint save/restore via orbax.

Equivalent of the reference checkpoint dicts {epoch, model, optimizer,
scheduler, best_metric, epochs_since_best} saved with ``torch.save``
(train_phoneme_to_articulation.py:303-314), but storing the full TrainState
pytree plus host-side scheduler state.
"""

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, state, aux: Optional[Dict[str, Any]] = None):
    """Save params+opt_state pytree and auxiliary JSON metadata."""
    directory = os.path.abspath(directory)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        os.path.join(directory, "state"),
        {"params": state.params, "opt_state": state.opt_state, "step": state.step},
        force=True,
    )
    if aux is not None:
        with open(os.path.join(directory, "aux.json"), "w") as f:
            json.dump(aux, f)


def restore_checkpoint(directory: str, state):
    """Restore into an existing TrainState template. Returns (state, aux)."""
    directory = os.path.abspath(directory)
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = ckptr.restore(os.path.join(directory, "state"), item=template)
    state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    aux_path = os.path.join(directory, "aux.json")
    aux = None
    if os.path.isfile(aux_path):
        with open(aux_path) as f:
            aux = json.load(f)
    return state, aux


def save_params(path: str, params):
    """Save a bare parameter pytree (model-only artifact, like the reference
    ``best_model.pt`` state dicts)."""
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)


def load_params(path: str, template):
    """Restore a bare parameter pytree. Accepts either a model-only artifact
    (save_params output) or a full train-state checkpoint directory/its
    ``state`` subdir — the params subtree is extracted in that case."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    candidates = [path]
    if os.path.isdir(os.path.join(path, "state")):
        candidates.insert(0, os.path.join(path, "state"))
    errors = []
    for p in candidates:
        try:
            return ckptr.restore(p, item=template)
        except Exception as exc:  # structure mismatch -> try full-state form
            errors.append((f"{p} (as params)", exc))
        try:
            # Build a host-array item skeleton from on-disk metadata (forcing
            # numpy restore, no shardings needed), then extract the params
            # subtree.
            item_meta = ckptr.metadata(p).item_metadata
            if item_meta is None or not hasattr(item_meta, "tree"):
                continue
            skeleton = jax.tree_util.tree_map(
                lambda m: np.zeros(m.shape, m.dtype), item_meta.tree
            )
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), skeleton
            )
            restored = ckptr.restore(p, item=skeleton, restore_args=restore_args)
            if isinstance(restored, dict) and "params" in restored:
                return restored["params"]
        except Exception as exc:
            errors.append((f"{p} (as full state)", exc))
    # Report every attempted candidate, not just the final fallback, so the
    # real structure-mismatch cause is visible; chain the first exception.
    summary = "; ".join(f"{where}: {type(e).__name__}: {e}" for where, e in errors)
    raise RuntimeError(
        f"load_params failed for {path} — tried {len(errors)} forms: {summary}"
    ) from (errors[0][1] if errors else None)
