"""Config-inventory parity with the reference thesis_config tree.

Walks every YAML under /root/reference/thesis_config and asserts the mapped
repo config exists, parses, and names an existing CLI module with the keys
that CLI requires. The synthetic-eval matrix itself runs end to end in
tests/test_method_comparison.py.
"""

import importlib
import os

import pytest
import yaml

REF_ROOT = "/root/reference/thesis_config"
REPO_CONFIGS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")

# reference path -> (repo config, CLI module, required keys)
MAPPING = {
    "model_free_phoneme_to_articulation/train_model_free.yaml": (
        "model_free/train_model_free.yaml",
        "train_phoneme_to_articulation",
        {"batch_size", "num_epochs", "articulators", "train_seq_dict"},
    ),
    "model_free_phoneme_to_articulation/test_model_free.yaml": (
        "model_free/test_model_free.yaml",
        "test_phoneme_to_articulation",
        {"state_dict_filepath", "test_seq_dict"},
    ),
    "model_free_phoneme_to_articulation/generate_vocal_tract_shape_model_free.yaml": (
        "model_free/generate_vocal_tract_shape_model_free.yaml",
        "generate_vocal_tract_shape",
        {"method", "seq_dict", "save_to"},
    ),
    "model_free_phoneme_to_articulation/generate_vcv_model_free.yaml": (
        "model_free/generate_vcv_model_free.yaml",
        "generate_vocal_tract_shape",
        {"method", "seq_dict", "save_to"},
    ),
    "model_free_phoneme_to_articulation/report_model_free.yaml": (
        "model_free/report_model_free.yaml",
        "report_phoneme_to_articulation",
        {"results_dir", "articulators"},
    ),
    "mean_contour_phoneme_to_articulation/train_mean_contour.yaml": (
        "mean_contour/train_mean_contour.yaml",
        "train_phoneme_wise_mean_contour",
        {"articulators", "train_seq_dict"},
    ),
    "mean_contour_phoneme_to_articulation/test_mean_contour.yaml": (
        "mean_contour/test_mean_contour.yaml",
        "test_phoneme_wise_mean_contour",
        {"table_filepath", "test_seq_dict"},
    ),
    "mean_contour_phoneme_to_articulation/generate_vocal_tract_shape_mean_contour.yaml": (
        "mean_contour/generate_vocal_tract_shape_mean_contour.yaml",
        "generate_vocal_tract_shape",
        {"method", "seq_dict", "save_to"},
    ),
    "mean_contour_phoneme_to_articulation/report_mean_contour.yaml": (
        "mean_contour/report_mean_contour.yaml",
        "report_phoneme_to_articulation",
        {"results_dir", "articulators"},
    ),
    "autoencoder_based_phoneme_to_articulation/norm_stats.yaml": (
        "autoencoder_based/norm_stats.yaml",
        "calculate_normalization_statistics",
        {"articulators"},
    ),
    "autoencoder_based_phoneme_to_articulation/train_autoencoder.yaml": (
        "autoencoder_based/train_autoencoder.yaml",
        "train_principal_components_autoencoder",
        {"indices_dict", "batch_size"},
    ),
    "autoencoder_based_phoneme_to_articulation/train_autoencoder_based.yaml": (
        "autoencoder_based/train_autoencoder_based.yaml",
        "train_phoneme_to_principal_components",
        {"indices_dict", "beta1", "encoder_state_dict_filepath"},
    ),
    "autoencoder_based_phoneme_to_articulation/train_pca_based.yaml": (
        "autoencoder_based/train_pca_based.yaml",
        "train_phoneme_to_principal_components",
        {"indices_dict", "rescale_factor"},
    ),
    "autoencoder_based_phoneme_to_articulation/test_autoencoder.yaml": (
        "autoencoder_based/test_autoencoder.yaml",
        "test_principal_components_autoencoder",
        {"indices_dict", "checkpoint_dir"},
    ),
    "autoencoder_based_phoneme_to_articulation/test_autoencoder_based.yaml": (
        "autoencoder_based/test_autoencoder_based.yaml",
        "test_phoneme_to_principal_components",
        {"indices_dict", "state_dict_filepath", "decoder_state_dict_filepath"},
    ),
    "autoencoder_based_phoneme_to_articulation/test_pca_based.yaml": (
        "autoencoder_based/test_pca_based.yaml",
        "test_phoneme_to_principal_components",
        {"indices_dict", "encoder_cls", "rescale_factor"},
    ),
    "autoencoder_based_phoneme_to_articulation/generate_vocal_tract_shape_autoencoder.yaml": (
        "autoencoder_based/generate_vocal_tract_shape_autoencoder.yaml",
        "generate_vocal_tract_shape",
        {"method", "indices_dict", "decoder_state_dict_filepath"},
    ),
    "autoencoder_based_phoneme_to_articulation/generate_vcv_autoencoder.yaml": (
        "autoencoder_based/generate_vcv_autoencoder.yaml",
        "generate_vocal_tract_shape",
        {"method", "indices_dict", "seq_dict"},
    ),
    "autoencoder_based_phoneme_to_articulation/report_autoencoder_based.yaml": (
        "autoencoder_based/report_autoencoder_based.yaml",
        "report_phoneme_to_articulation",
        {"results_dir", "articulators"},
    ),
}

# phoneme_recognition maps 1:1 by filename.
for name, nf in [
    ("train_acoustic", 80),
    ("train_air_column", 200),
    ("train_air_column_voicing", 200),
    ("train_vocal_tract", 500),
    ("train_vocal_tract_voicing", 500),
]:
    MAPPING[f"phoneme_recognition/{name}.yaml"] = (
        f"phoneme_recognition/{name}.yaml",
        "train_phoneme_recognition",
        {"feature", "target", "loss", "train_seq_dict"},
    )
for name in [
    "test_acoustic",
    "test_air_column",
    "test_air_column_voicing",
    "test_vocal_tract",
    "test_vocal_tract_voicing",
    "test_synthetic_autoencoder_vocal_tract",
    "test_synthetic_autoencoder_vocal_tract_voicing",
    "test_synthetic_encoder_decoder_vocal_tract",
    "test_synthetic_encoder_decoder_vocal_tract_voicing",
    "test_synthetic_mean_contour_vocal_tract",
    "test_synthetic_mean_contour_vocal_tract_voicing",
]:
    MAPPING[f"phoneme_recognition/{name}.yaml"] = (
        f"phoneme_recognition/{name}.yaml",
        "test_phoneme_recognition",
        {"feature", "state_dict_filepath"},
    )


def _reference_yamls():
    if not os.path.isdir(REF_ROOT):
        return []
    out = []
    for dirpath, _dirs, files in os.walk(REF_ROOT):
        for f in files:
            if f.endswith(".yaml"):
                out.append(os.path.relpath(os.path.join(dirpath, f), REF_ROOT))
    return sorted(out)


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="reference tree absent")
def test_every_reference_config_is_mapped():
    refs = _reference_yamls()
    assert len(refs) == 35  # 36 files = 35 yaml + voicing.json
    missing = [r for r in refs if r not in MAPPING]
    assert not missing, f"unmapped reference configs: {missing}"


@pytest.mark.parametrize("ref", sorted(MAPPING))
def test_mapped_config_exists_and_is_consumable(ref):
    repo_rel, cli_module, required = MAPPING[ref]
    path = os.path.join(REPO_CONFIGS, repo_rel)
    assert os.path.isfile(path), f"missing repo config {repo_rel} (for {ref})"
    with open(path) as f:
        cfg = yaml.safe_load(f)
    assert isinstance(cfg, dict) and cfg
    missing_keys = required - set(cfg)
    assert not missing_keys, f"{repo_rel} lacks keys {missing_keys}"
    module = importlib.import_module(f"artspeech_tpu.cli.{cli_module}")
    assert hasattr(module, "main")


def test_voicing_json_exists():
    assert os.path.isfile(
        os.path.join(REPO_CONFIGS, "phoneme_recognition", "voicing.json")
    )
