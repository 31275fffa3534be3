"""Multi-device sharding tests on the 8-device CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artspeech_tpu.models.artspeech_rnn import ArtSpeech
from artspeech_tpu.parallel.distributed import distribute_state, run_distributed_step
from artspeech_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    params_shardings,
    shard_batch,
)
from artspeech_tpu.train.state import create_train_state
from artspeech_tpu.train.step import make_artspeech_train_step


def test_mesh_shapes():
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[MODEL_AXIS] == 2
    with pytest.raises(ValueError):
        make_mesh(model_parallel=3)


def test_sharded_train_step_matches_single_device():
    """One dp x tp training step must produce the same loss as single-device."""
    n_art = 8  # divisible by model axis
    model = ArtSpeech(vocab_size=16, n_articulators=n_art, hidden_size=8)
    b, t = 8, 12
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 16, (b, t)), jnp.int32)
    lengths = jnp.full((b,), t, jnp.int32)
    targets = jnp.asarray(rng.uniform(size=(b, t, n_art, 2, 50)), jnp.float32)
    batch = {"tokens": tokens, "targets": targets, "lengths": lengths}

    state = create_train_state(model, jax.random.PRNGKey(0), (tokens, lengths), 1e-3)
    step = make_artspeech_train_step(to_mm=220.0, donate=False, with_p2cp=True)
    _, metrics_single = step(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(model_parallel=2)
    state2 = create_train_state(model, jax.random.PRNGKey(0), (tokens, lengths), 1e-3)
    state2 = distribute_state(state2, mesh)
    # stacked articulator-head params actually sharded over the model axis
    head_leaf = jax.tree_util.tree_leaves(state2.params)[-1]
    _, metrics_sharded = run_distributed_step(
        step, state2, batch, jax.random.PRNGKey(1), mesh
    )
    np.testing.assert_allclose(
        float(metrics_sharded["loss"]), float(metrics_single["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics_sharded["p2cp_mm"]),
        float(metrics_single["p2cp_mm"]),
        rtol=1e-4,
    )


def test_params_shardings_heuristic():
    mesh = make_mesh(model_parallel=2)
    params = {
        "heads": jnp.zeros((8, 16, 16)),  # stacked -> sharded
        "dense": jnp.zeros((7, 16)),  # odd leading dim -> replicated
        "bias": jnp.zeros((16,)),  # 1D -> replicated
    }
    sh = params_shardings(params, mesh)
    assert MODEL_AXIS in str(sh["heads"].spec)
    assert sh["dense"].spec == jax.sharding.PartitionSpec()
    assert sh["bias"].spec == jax.sharding.PartitionSpec()


def test_batch_sharding_spreads_over_data_axis():
    mesh = make_mesh(model_parallel=2)
    batch = {"x": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec(DATA_AXIS)
    # batch rows split 4 ways over data (and replicated over model)
    shard_shapes = {s.data.shape for s in sharded["x"].addressable_shards}
    assert shard_shapes == {(2, 4)}
