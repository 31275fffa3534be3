"""Import reference PyTorch DeepSpeech2 weights into the flax model.

Equivalent of reference deepspeech2.py:197-217 (``load_librispeech_model``):
maps a torch state_dict with the reference layout (adapter, cnn,
residual_layers.N, linear, recurrent_layers.N, feature_extractor, classifier)
onto artspeech_tpu.models.deepspeech2.DeepSpeech2 parameters.

Layout conversions handled here:
- Linear: torch (out, in) -> flax kernel (in, out).
- Conv2d: torch NCHW kernels (O, I, KD, KT) -> flax NHWC kernels with our
  (B, T, D, C) layout, i.e. (KT, KD, I, O).
- GRU: torch (3H, X) weight matrices -> (X, 3H) transposed.
- The post-conv flatten: torch flattens (C, D) as c*D + d, our NHWC reshape
  flattens (D, C) as d*C + c — the big Dense's input rows are permuted.

State dicts are accepted as {name: np.ndarray}; load a torch ``.pt`` with
``load_torch_state_dict`` (requires torch; arrays come back as numpy).
"""

from typing import Dict

import numpy as np


def load_torch_state_dict(filepath: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(filepath, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _linear(sd, prefix):
    return {
        "kernel": sd[f"{prefix}.weight"].T.astype(np.float32),
        "bias": sd[f"{prefix}.bias"].astype(np.float32),
    }


def _layernorm(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"].astype(np.float32),
        "bias": sd[f"{prefix}.bias"].astype(np.float32),
    }


def _conv(sd, prefix):
    # torch (O, I, KD, KT) -> flax (KT, KD, I, O) for our (B, T, D, C) layout.
    w = sd[f"{prefix}.weight"].transpose(3, 2, 1, 0).astype(np.float32)
    return {"kernel": w, "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _gru(sd, prefix):
    return {
        "wi": sd[f"{prefix}.weight_ih_l0"].T.astype(np.float32),
        "bi": sd[f"{prefix}.bias_ih_l0"].astype(np.float32),
        "wh": sd[f"{prefix}.weight_hh_l0"].T.astype(np.float32),
        "bh": sd[f"{prefix}.bias_hh_l0"].astype(np.float32),
    }


def convert_artspeech_state_dict(
    sd: Dict[str, np.ndarray], num_layers: int = 2
) -> Dict:
    """Convert a reference ArtSpeech torch state dict (encoder_decoder/
    models.py:99-145) into our flax ArtSpeech parameter pytree.

    Embedding + 2-layer BiGRU + Linear head map 1:1; the per-articulator
    ``ArticulatorPredictor`` ModuleList stacks onto the leading (Nart, ...)
    axis of the nn.vmap-lifted heads.
    """
    params: Dict = {
        "Embed_0": {"embedding": sd["embedding.weight"].astype(np.float32)},
        "Dense_0": _linear(sd, "linear.0"),
        "BiGRU_0": {},
    }
    idx = 0
    for layer in range(num_layers):
        for direction in ("", "_reverse"):
            params["BiGRU_0"][f"GRULayer_{idx}"] = {
                "wi": sd[f"rnn.weight_ih_l{layer}{direction}"].T.astype(np.float32),
                "bi": sd[f"rnn.bias_ih_l{layer}{direction}"].astype(np.float32),
                "wh": sd[f"rnn.weight_hh_l{layer}{direction}"].T.astype(np.float32),
                "bh": sd[f"rnn.bias_hh_l{layer}{direction}"].astype(np.float32),
            }
            idx += 1

    n_art = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("predictors.")
    )

    def stack_linear(suffix):
        return {
            "kernel": np.stack(
                [sd[f"predictors.{i}.{suffix}.weight"].T for i in range(n_art)]
            ).astype(np.float32),
            "bias": np.stack(
                [sd[f"predictors.{i}.{suffix}.bias"] for i in range(n_art)]
            ).astype(np.float32),
        }

    def stack_layernorm(suffix):
        return {
            "scale": np.stack(
                [sd[f"predictors.{i}.{suffix}.weight"] for i in range(n_art)]
            ).astype(np.float32),
            "bias": np.stack(
                [sd[f"predictors.{i}.{suffix}.bias"] for i in range(n_art)]
            ).astype(np.float32),
        }

    params["ContourDecoder_0"] = {
        "VmapArticulatorPredictor_0": {
            "LayerNorm_0": stack_layernorm("linear.0"),
            "Dense_0": stack_linear("linear.1"),
            "LayerNorm_1": stack_layernorm("linear.3"),
            "Dense_1": stack_linear("linear.4"),
            "LayerNorm_2": stack_layernorm("linear.6"),
            "Dense_2": stack_linear("x_coords"),
            "Dense_3": stack_linear("y_coords"),
        }
    }
    return params


def convert_deepspeech2_state_dict(
    sd: Dict[str, np.ndarray],
    num_residual_layers: int,
    num_rnn_layers: int,
    conv_channels: int = 32,
    skip_classifier: bool = False,
) -> Dict:
    """Build the flax params dict from a reference torch state_dict.

    Args:
        skip_classifier: drop the classifier head (reference swaps it for a
            fresh one when fine-tuning on a new vocabulary,
            train_phoneme_recognition.py:112-118).
    """
    params: Dict = {}

    if "adapter.adapter.0.weight" in sd:
        params["Adapter_0"] = {
            "LayerNorm_0": _layernorm(sd, "adapter.adapter.0"),
            "Dense_0": _linear(sd, "adapter.adapter.1"),
            "LayerNorm_1": _layernorm(sd, "adapter.adapter.2"),
            "Dense_1": _linear(sd, "adapter.adapter.3"),
        }

    params["Conv_0"] = _conv(sd, "cnn")

    for i in range(num_residual_layers):
        params[f"ResidualCNN_{i}"] = {
            "LayerNorm_0": _layernorm(sd, f"residual_layers.{i}.layer_norm1"),
            "Conv_0": _conv(sd, f"residual_layers.{i}.cnn1"),
            "LayerNorm_1": _layernorm(sd, f"residual_layers.{i}.layer_norm2"),
            "Conv_1": _conv(sd, f"residual_layers.{i}.cnn2"),
        }

    # Big linear after the conv stack: permute input rows c*D+d -> d*C+c.
    w = sd["linear.weight"].T.astype(np.float32)  # (C*D, H) torch ordering
    cd = w.shape[0]
    d = cd // conv_channels
    perm = np.asarray(
        [c * d + dd for dd in range(d) for c in range(conv_channels)]
    )
    params["Dense_0"] = {
        "kernel": w[perm],
        "bias": sd["linear.bias"].astype(np.float32),
    }

    for i in range(num_rnn_layers):
        params[f"RecurrentBlock_{i}"] = {
            "LayerNorm_0": _layernorm(sd, f"recurrent_layers.{i}.layer_norm"),
            "GRUStack_0": {
                "GRULayer_0": _gru(sd, f"recurrent_layers.{i}.rnn")
            },
        }

    params["Dense_1"] = _linear(sd, "feature_extractor.0")
    if not skip_classifier and "classifier.weight" in sd:
        params["Dense_2"] = _linear(sd, "classifier")
    return params


def load_librispeech_deepspeech2(
    filepath: str,
    num_classes: int,
    num_features: int = 80,
    adapter_out_features=None,
    dtype=None,
):
    """Reference ``DeepSpeech2.load_librispeech_model`` equivalent: build the
    flax model with the LibriSpeech architecture (deepspeech2.py:197-211:
    5 residual + 3 GRU layers, hidden 128) and import the torch weights,
    dropping the classifier when num_classes differs from 31."""
    import jax
    import jax.numpy as jnp

    from artspeech_tpu.models.deepspeech2 import DeepSpeech2

    sd = load_torch_state_dict(filepath)
    model = DeepSpeech2(
        in_channels=2,
        num_residual_layers=5,
        num_rnn_layers=3,
        rnn_hidden_size=128,
        num_classes=num_classes,
        num_features=num_features,
        dropout=0.05,
        adapter_out_features=adapter_out_features,
        dtype=dtype,
    )
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, num_features, 8))
    )["params"]
    imported = convert_deepspeech2_state_dict(
        sd, num_residual_layers=5, num_rnn_layers=3,
        skip_classifier=num_classes != sd.get("classifier.weight", np.zeros((0,))).shape[0],
    )
    merged = dict(template)
    merged.update(imported)
    return model, merged
