"""torchaudio stand-in: load/save over the stdlib wave module, plus the
MelSpectrogram transform the reference datasets build (torch STFT)."""

import numpy as np
import torch

from artspeech_tpu.data import audio as _audio

from torchaudio import functional, transforms  # noqa: F401


def load(filepath, *args, **kwargs):
    """(tensor (1, N) float32, sample_rate) — reference mono-averages
    immediately (video.py:17-18), so collapsing channels here is safe."""
    data, sr = _audio.read_wav(filepath)
    return torch.from_numpy(np.asarray(data, np.float32)).unsqueeze(0), sr


def save(filepath, tensor, sample_rate, *args, **kwargs):
    arr = tensor.detach().cpu().numpy()
    if arr.ndim == 2:
        arr = arr.mean(axis=0)
    _audio.write_wav(filepath, arr.astype(np.float32), sample_rate)
