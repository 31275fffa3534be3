"""Generate the melspec golden fixture with torch.stft (torchaudio's engine).

torchaudio's ``MelSpectrogram`` is ``torch.stft`` (hann window, center
reflect padding, power 2) followed by a matmul with
``melscale_fbanks(mel_scale="htk", norm=None)``; core torch provides the
STFT, and the HTK filterbank below is the published torchaudio formula.
This makes the fixture an implementation-independent golden for
artspeech_tpu.ops.melspec (framed-matmul DFT in JAX) that works in images
without torchaudio. With torchaudio installed, the live parity test in
tests/test_recognition.py still runs against the real thing.

Run:  python tests/fixtures/gen_melspec_golden.py
"""

import os

import numpy as np
import torch


def htk_fbank(n_mels, n_freqs, sample_rate, f_min=0.0, f_max=None):
    f_max = f_max or sample_rate / 2.0
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f, float) / 700.0)
    mel2hz = lambda m: 700.0 * (10.0 ** (np.asarray(m, float) / 2595.0) - 1.0)
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    f_pts = mel2hz(np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2))
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    fb = np.maximum(0.0, np.minimum(-slopes[:, :-2] / f_diff[:-1],
                                    slopes[:, 2:] / f_diff[1:]))
    return fb.astype(np.float32)


def main():
    sr, n_fft, hop, n_mels = 16000, 1024, 256, 80
    rng = np.random.default_rng(0)
    audio = rng.normal(size=16000).astype(np.float32) * 0.1

    spec = torch.stft(
        torch.from_numpy(audio),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )  # (F, T)
    power = spec.abs() ** 2
    fb = torch.from_numpy(htk_fbank(n_mels, n_fft // 2 + 1, sr))
    mel = fb.T @ power  # (n_mels, T)

    out = os.path.join(os.path.dirname(__file__), "melspec_golden.npz")
    np.savez_compressed(out, audio=audio, mel=mel.numpy().astype(np.float32),
                        sample_rate=sr, n_fft=n_fft, hop_length=hop,
                        n_mels=n_mels)
    print("wrote", out, mel.shape)


if __name__ == "__main__":
    main()
