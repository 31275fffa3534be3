"""Train the multi-articulator frame autoencoder.

Equivalent of reference train_principal_components_autoencoder.py:67-356:
RegularizedLatentsMSELoss (weighted MSE + off-diagonal latent covariance),
best metric = reconstruction p2cp_mm, encoder/decoder params saved separately
(downstream losses load them independently).

Usage: python -m artspeech_tpu.cli.train_principal_components_autoencoder \
           --config cfg.yaml
Config keys: datadir, database_name, num_epochs, batch_size, patience,
learning_rate, weight_decay, alpha, indices_dict (articulator -> n components),
train/valid/test_seq_dict, articulators (or from indices_dict), clip_tails,
hidden_features, encoder_cls/decoder_cls (AE | PCA), seed.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from artspeech_tpu.cli.common import run_experiment
from artspeech_tpu.core.config import DATASET_CONFIG, mm_per_unit
from artspeech_tpu.data.pc_datasets import (
    AutoencoderDataset,
    compute_normalization_statistics,
    load_norm_stats,
    stack_norm_stats,
)
from artspeech_tpu.eval.autoencoder import nomograms, run_autoencoder_test
from artspeech_tpu.models.autoencoder import (
    MultiArticulatorAutoencoder,
    latent_size_of,
    normalize_indices_dict,
)
from artspeech_tpu.train.checkpoint import restore_checkpoint, save_checkpoint, save_params
from artspeech_tpu.train.pc_step import (
    make_autoencoder_eval_step,
    make_autoencoder_train_step,
)
from artspeech_tpu.train.state import TrainState, count_parameters
from artspeech_tpu.utils.io import sequences_from_dict


def main(cfg, args, tracker):
    database_name = cfg["database_name"]
    to_mm = mm_per_unit(DATASET_CONFIG[database_name])
    indices_dict = normalize_indices_dict(cfg["indices_dict"])
    articulators = sorted(cfg.get("articulators") or indices_dict.keys())
    clip_tails = cfg.get("clip_tails", True)
    datadir = cfg["datadir"]

    stats_dir = os.path.join(datadir, "normalization_statistics")
    if not os.path.isdir(stats_dir):
        compute_normalization_statistics(
            datadir,
            database_name,
            sequences_from_dict(datadir, cfg["train_seq_dict"]),
            articulators,
            clip_tails=clip_tails,
            save_to=stats_dir,
        )
    norm_stats = load_norm_stats(datadir, articulators)
    denorm_mean, denorm_std = stack_norm_stats(norm_stats, articulators)

    datasets = {
        split: AutoencoderDataset(
            datadir,
            database_name,
            sequences_from_dict(datadir, cfg[key]),
            articulators,
            clip_tails=clip_tails,
            norm_stats=norm_stats,
        )
        for split, key in (
            ("train", "train_seq_dict"),
            ("valid", "valid_seq_dict"),
            ("test", "test_seq_dict"),
        )
    }

    model = MultiArticulatorAutoencoder(
        indices_dict=indices_dict,
        in_features=cfg.get("in_features", 100),
        hidden_features=cfg.get("hidden_features", 50),
        encoder_cls=cfg.get("encoder_cls", "AE"),
        decoder_cls=cfg.get("decoder_cls", "AE"),
    )
    sample = jnp.zeros(
        (cfg["batch_size"], len(articulators), cfg.get("in_features", 100))
    )
    params = model.init(jax.random.PRNGKey(cfg.get("seed", 0)), sample)["params"]
    tx = optax.adamw(cfg["learning_rate"], weight_decay=cfg.get("weight_decay", 0.0))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    # Data-parallel by default: frame batches shard over all local devices
    # (zero-weight dummy rows make the batch dim divisible).
    from artspeech_tpu.data.batching import prefetch_to_device, round_up_to_multiple
    from artspeech_tpu.parallel.distributed import distribute_state
    from artspeech_tpu.parallel.mesh import batch_sharding, data_parallel_mesh

    n_devices = len(jax.devices())
    pad_bs = round_up_to_multiple(cfg["batch_size"], n_devices)
    mesh = data_parallel_mesh(pad_bs)
    state = distribute_state(state, mesh)
    sharding = batch_sharding(mesh)

    tracker.log_params({"num_network_params": count_parameters(params)})
    print(f"MultiArticulatorAutoencoder -- {count_parameters(params)} parameters")

    alpha = cfg.get("alpha", 0.1)
    train_step = make_autoencoder_train_step(
        model, indices_dict, alpha, denorm_mean, denorm_std, to_mm
    )
    eval_step = make_autoencoder_eval_step(
        model, indices_dict, alpha, denorm_mean, denorm_std, to_mm
    )

    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    best_metric, since_best = float("inf"), 0
    for epoch in range(cfg["num_epochs"]):
        metrics_sum, total_w = {}, 0.0
        for batch, meta in prefetch_to_device(
            datasets["train"].batches(
                cfg["batch_size"],
                shuffle=True,
                seed=cfg.get("seed", 0) + epoch,
                pad_to_multiple=n_devices,
            ),
            sharding=sharding,
        ):
            state, metrics = train_step(state, batch)
            w = float(meta.get("n_valid", 1))  # frame-weighted epoch mean
            total_w += w
            for k, v in metrics.items():
                metrics_sum[k] = metrics_sum.get(k, 0.0) + w * v
        train_metrics = {
            k: float(v) / max(total_w, 1.0)
            for k, v in jax.device_get(metrics_sum).items()
        }

        metrics_sum, total_w = {}, 0.0
        for batch, meta in prefetch_to_device(
            datasets["valid"].batches(
                cfg["batch_size"], shuffle=False, pad_to_multiple=n_devices
            ),
            sharding=sharding,
        ):
            metrics, _ = eval_step(state, batch)
            w = float(meta.get("n_valid", 1))
            total_w += w
            for k, v in metrics.items():
                metrics_sum[k] = metrics_sum.get(k, 0.0) + w * v
        valid_metrics = {
            k: float(v) / max(total_w, 1.0)
            for k, v in jax.device_get(metrics_sum).items()
        }

        record = {
            **{f"train_{k}": v for k, v in train_metrics.items()},
            **{f"valid_{k}": v for k, v in valid_metrics.items()},
        }
        tracker.log_metrics(record, step=epoch)
        print(f"epoch {epoch}: {record}")

        if valid_metrics["p2cp_mm"] < best_metric:
            best_metric, since_best = valid_metrics["p2cp_mm"], 0
            save_checkpoint(os.path.join(ckpt_dir, "best"), state)
            # encoder/decoder saved separately (reference :230-239)
            save_params(
                os.path.join(ckpt_dir, "best_encoder"),
                state.params["encoders"],
            )
            save_params(
                os.path.join(ckpt_dir, "best_decoder"),
                state.params["decoders"],
            )
        else:
            since_best += 1
        save_checkpoint(
            os.path.join(ckpt_dir, "last"),
            state,
            aux={"epoch": epoch, "best_metric": best_metric},
        )
        if since_best > cfg.get("patience", 30):
            break

    state, _ = restore_checkpoint(os.path.join(ckpt_dir, "best"), state)
    outputs_dir = os.path.join(args.output_dir, "test_outputs")
    info = run_autoencoder_test(
        state,
        eval_step,
        datasets["test"],
        cfg["batch_size"],
        denorm_mean,
        denorm_std,
        to_mm,
        articulators,
        outputs_dir=outputs_dir,
    )

    # Nomograms: per-component decoder sweeps (reference test CLI :32-321).
    def decode_fn(z):
        return model.apply(
            {"params": state.params}, z, method=MultiArticulatorAutoencoder.decode
        )

    noms = nomograms(
        jax.jit(decode_fn),
        latent_size_of(indices_dict),
        indices_dict,
        denorm_mean,
        denorm_std,
    )
    np.savez(
        os.path.join(outputs_dir, "nomograms.npz"),
        **{f"component_{i}": v for i, v in noms.items()},
    )
    tracker.log_dict(info, "test_results.json")
    print(json.dumps(info, indent=2))
    return info


if __name__ == "__main__":
    run_experiment("Train multi-articulator autoencoder", main)
