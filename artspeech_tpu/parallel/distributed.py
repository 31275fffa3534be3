"""Distributed training helpers: state distribution + multi-host init.

The reference is single-device (SURVEY.md §2); these helpers are the
TPU-native addition: put a TrainState's parameters and optimizer state onto
a (data, model) mesh (stacked per-articulator/channel parameter axes shard
over ``model``, everything else replicates) and let XLA insert all
collectives when the jitted step runs on sharded inputs.
"""

from typing import Optional

import jax

from artspeech_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    params_shardings,
    replicated,
    shard_batch,
)


def distribute_state(state, mesh):
    """Device-put params and optimizer state with mesh shardings.

    Optimizer moments mirror parameter shapes, so they get the same layout
    heuristic; non-array leaves (step counts, schedules) pass through.
    """

    def put(tree):
        shardings = params_shardings(tree, mesh)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s) if hasattr(x, "ndim") else x,
            tree,
            shardings,
        )

    opt_state = jax.tree_util.tree_map(
        lambda x: (
            jax.device_put(
                x, params_shardings({"x": x}, mesh)["x"]
            )
            if hasattr(x, "ndim")
            else x
        ),
        state.opt_state,
    )
    return state.replace(params=put(state.params), opt_state=opt_state)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize passthrough for multi-host pods.

    A true no-op when every argument is None — auto-detection raises outside
    managed TPU/cluster environments, so single-host callers are safe.
    Double initialization is tolerated."""
    if coordinator_address is None and num_processes is None and process_id is None:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:
        if "already" not in str(exc).lower():
            raise


def run_distributed_step(train_step, state, batch, rng, mesh):
    """Convenience: shard the host batch over ``data`` and run one step
    inside the mesh context."""
    with mesh:
        sharded = shard_batch(batch, mesh)
        return train_step(state, sharded, rng)
