"""MelSpectrogram matching torchaudio defaults used by the reference
(phoneme_recognition/datasets.py: n_fft=1024, win=1024, hop=256, 80 mels,
power=2, HTK mel scale, center=True reflect pad)."""

import math

import torch


def _hz_to_mel(f):
    return 2595.0 * math.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def _mel_filterbank(n_freqs, n_mels, sample_rate, f_min=0.0, f_max=None):
    f_max = f_max or sample_rate / 2.0
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
    m_pts = torch.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = torch.tensor([_mel_to_hz(float(m)) for m in m_pts])
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down, up), min=0.0)
    return fb  # (n_freqs, n_mels)


class MelSpectrogram(torch.nn.Module):
    def __init__(
        self,
        sample_rate=16000,
        n_fft=400,
        win_length=None,
        hop_length=None,
        n_mels=128,
        f_min=0.0,
        f_max=None,
        power=2.0,
        center=True,
        **kwargs,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.power = power
        self.center = center
        self.register_buffer("window", torch.hann_window(self.win_length))
        self.register_buffer(
            "fb", _mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max)
        )

    def forward(self, waveform):
        spec = torch.stft(
            waveform,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window,
            center=self.center,
            pad_mode="reflect",
            return_complex=True,
        )
        spec = spec.abs() ** self.power  # (..., n_freqs, T)
        return torch.matmul(self.fb.T, spec)  # (..., n_mels, T)
