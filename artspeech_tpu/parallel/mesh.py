"""Device mesh and sharding layouts.

The reference is strictly single-device (SURVEY.md section 2: no DP/TP/PP and
no distributed backend). The TPU-native design adds:

- ``data`` axis: batch (data parallel) over ICI.
- ``model`` axis: the articulator/channel axis — per-articulator prediction
  heads, autoencoder per-articulator encoders/decoders and transformer
  channels carry a leading Nart parameter axis, which shards naturally as
  tensor parallelism.

All collectives are XLA-inserted via NamedSharding under jit; there is no
hand-rolled communication.
"""

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def data_parallel_mesh(
    batch_size: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Default production mesh: pure dp over local devices.

    When ``batch_size`` is given, the data axis uses the largest device
    count that divides it (a sharded batch dim must split evenly); on a
    single chip this is a 1-device mesh, so nothing regresses. Loaders
    built with ``pad_to_multiple=len(jax.devices())`` make the collated
    batch divisible so all devices participate.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if batch_size:
        bs = int(batch_size)
        n = next((d for d in range(n, 0, -1) if bs % d == 0), 1)
    return make_mesh(devices[:n], model_parallel=1)


def make_mesh(
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
    axis_names=(DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def params_shardings(params, mesh: Mesh):
    """Sharding pytree for model parameters.

    Heuristic layout: any parameter whose leading axis is divisible by the
    model-axis size *and* is at least 2 (stacked articulator/channel heads
    produced by ``nn.vmap`` lifts) shards its leading axis over ``model``;
    everything else is replicated. Embeddings/RNNs are small here, so
    replication is the right call (their all-reduce cost would dominate).
    """
    model_size = mesh.shape[MODEL_AXIS]

    def spec_for(x):
        if (
            model_size > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[0] >= model_size
            and x.shape[0] % model_size == 0
        ):
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the batch axis over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
