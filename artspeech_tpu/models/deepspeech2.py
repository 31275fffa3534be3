"""DeepSpeech2 phoneme recognizer in flax.

Equivalent of reference phoneme_recognition/deepspeech2.py:15-217: Conv2d stem
(+ additive voicing broadcast) -> N x pre-LN GELU residual CNN blocks ->
Linear -> N x LayerNorm/GELU GRU blocks -> feature extractor -> classifier,
with an optional Adapter MLP mapping the feature axis to 80 dims for
LibriSpeech-pretrained compatibility.

Layout note: the reference feeds (B, C, D, T) (channels, feature-dim, time).
Internally we keep (B, T, D, C) — NHWC is the TPU-native conv layout — and
transpose once at the boundary. GRU blocks reuse the masked scan from
artspeech_tpu.ops.gru (uni-directional, as in the reference, so the model
stays streamable).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from artspeech_tpu.ops.gru import GRUStack


class ShiftedMatmulConv(nn.Module):
    """KxK SAME conv on (B, T, D, C) as K*K shifted matmuls on the MXU.

    Drop-in replacement for ``nn.Conv(features, (K, K), padding="SAME")`` —
    same param names ("kernel" (K, K, I, O), "bias" (O,)) and the same
    per-backend numerics: the dots run at default matmul precision (one bf16
    MXU pass on TPU — which is also what XLA's TPU convolution does
    internally for f32 inputs, per its emitted bf16 `copy` ops — and full
    f32 on CPU), accumulated in f32.

    Why: at the recognizer's widths (C=32) the XLA conv op imposes a C-minor
    operand layout while the surrounding fusions settle on T-minor, costing
    ~6ms/step of pure layout copies (35 copies of the (8,321,80,32)
    activation — profiled round 3). Expressing the conv as a sum of K*K
    pad-shift + ``dot_general`` terms leaves the whole stack in one layout:
    recognizer train step 20.5ms -> 13.2ms device (B=8, T=321, f32). A
    single im2col matmul was also measured and LOSES (26.6ms f32 / 20.8ms
    bf16 concat): materializing the 9x-expanded patch tensor is pure HBM
    traffic. Rebuilds reference phoneme_recognition/deepspeech2.py Conv2d
    uses (deepspeech2.py:15-47,90-130).
    """

    features: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):  # (B, T, D, C)
        k = self.kernel_size
        assert k % 2 == 1, "SAME shifted-matmul conv needs an odd kernel"
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        b, t, d, _ = x.shape
        p = k // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0))).astype(dt)
        wk = kernel.astype(dt)
        acc = None
        for i in range(k):
            for j in range(k):
                term = jax.lax.dot_general(
                    xp[:, i : i + t, j : j + d, :],
                    wk[i, j],
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = term if acc is None else acc + term
        return (acc + bias).astype(dt)


class Adapter(nn.Module):
    """LN -> Dense -> LN -> Dense over the feature axis
    (reference deepspeech2.py:73-87)."""

    out_features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):  # (B, T, D, C)
        x = jnp.swapaxes(x, -1, -2)  # (B, T, C, D)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype)(x)
        return jnp.swapaxes(x, -1, -2)  # (B, T, D', C)


class ResidualCNN(nn.Module):
    """Pre-LN GELU double conv with residual (reference deepspeech2.py:15-47).

    The reference LayerNorms over the feature axis D of (B, C, D, T); here the
    tensor is (B, T, D, C) and the norm runs over D with per-D scale/offset.
    """

    channels: int
    kernel_size: int = 3
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (B, T, D, C)
        def norm_over_d(h):
            # LayerNorm over the D axis (axis -2), parameters shaped (D, 1).
            return nn.LayerNorm(reduction_axes=-2, feature_axes=-2, dtype=self.dtype)(h)

        def conv(h, name):
            # Named "Conv_N" to stay pytree-compatible with nn.Conv
            # checkpoints and the torch importer (utils/torch_import.py).
            return ShiftedMatmulConv(
                self.channels, self.kernel_size, dtype=self.dtype, name=name
            )(h)

        out = norm_over_d(x)
        out = nn.gelu(out, approximate=False)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = conv(out, "Conv_0")
        out = norm_over_d(out)
        out = nn.gelu(out, approximate=False)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = conv(out, "Conv_1")
        return out + x


class RecurrentBlock(nn.Module):
    """LN -> GELU -> GRU -> dropout (reference deepspeech2.py:50-70)."""

    hidden_size: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):  # (B, T, H)
        out = nn.LayerNorm(dtype=self.dtype)(x)
        out = nn.gelu(out, approximate=False)
        out = GRUStack(self.hidden_size, num_layers=1, dtype=self.dtype)(out, mask)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class DeepSpeech2(nn.Module):
    """Reference deepspeech2.py:90-195 rebuilt for (B, C, D, T) inputs."""

    in_channels: int = 2
    num_residual_layers: int = 4
    num_rnn_layers: int = 2
    rnn_hidden_size: int = 64
    num_classes: int = 31
    num_features: int = 80
    dropout: float = 0.1
    adapter_out_features: Optional[int] = None
    conv_channels: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x,
        voicing=None,
        lengths=None,
        return_features: bool = False,
        deterministic: bool = True,
    ):
        """
        Args:
            x: (B, C, D, T) features (reference layout).
            voicing: optional (B, T) additive voicing signal.
            lengths: optional (B,) valid time lengths for the masked GRU.
        Returns:
            (B, T, num_classes) logits [, (B, T, H) features].
        """
        x = jnp.transpose(x, (0, 3, 2, 1))  # -> (B, T, D, C)
        if self.adapter_out_features is not None:
            x = Adapter(self.adapter_out_features, dtype=self.dtype)(x)

        out = ShiftedMatmulConv(
            self.conv_channels, 3, dtype=self.dtype, name="Conv_0"
        )(x)
        if voicing is not None:
            # Additive broadcast over (D, C) (reference deepspeech2.py:174-177).
            out = out + voicing[:, :, None, None]
        for _ in range(self.num_residual_layers):
            out = ResidualCNN(
                self.conv_channels, dropout=self.dropout, dtype=self.dtype
            )(out, deterministic=deterministic)

        b, t, d, c = out.shape
        out = out.reshape(b, t, d * c)
        out = nn.Dense(self.rnn_hidden_size, dtype=self.dtype)(out)

        if lengths is None:
            mask = jnp.ones((b, t), bool)
        else:
            mask = jnp.arange(t)[None, :] < lengths[:, None]
        for _ in range(self.num_rnn_layers):
            out = RecurrentBlock(
                self.rnn_hidden_size, dropout=self.dropout, dtype=self.dtype
            )(out, mask, deterministic=deterministic)

        features = nn.gelu(
            nn.Dense(self.rnn_hidden_size, dtype=self.dtype)(out), approximate=False
        )
        dropped = nn.Dropout(self.dropout)(features, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=self.dtype)(dropped)

        if return_features:
            return logits, features
        return logits


def get_noise_logits(logits, factor: float, rng):
    """Large-margin logit noise (reference deepspeech2.py:148-151)."""
    return logits + factor * jax.random.normal(rng, logits.shape, logits.dtype)


def get_normalized_outputs(logits, use_log_prob: bool = False):
    """softmax / log_softmax over classes (reference deepspeech2.py:153-157)."""
    fn = jax.nn.log_softmax if use_log_prob else jax.nn.softmax
    return fn(logits, axis=-1)
