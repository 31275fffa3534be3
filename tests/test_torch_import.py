"""Golden parity: full DeepSpeech2 forward vs a torch model with the
reference architecture, weights imported via utils/torch_import."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from artspeech_tpu.models.deepspeech2 import DeepSpeech2
from artspeech_tpu.utils.torch_import import convert_deepspeech2_state_dict


class TorchResidualCNN(tnn.Module):
    """Reference deepspeech2.py:15-47 architecture (test fixture)."""

    def __init__(self, channels, num_features):
        super().__init__()
        self.cnn1 = tnn.Conv2d(channels, channels, 3, 1, padding=1)
        self.layer_norm1 = tnn.LayerNorm(num_features)
        self.cnn2 = tnn.Conv2d(channels, channels, 3, 1, padding=1)
        self.layer_norm2 = tnn.LayerNorm(num_features)

    def forward(self, x):  # (B, C, D, T)
        out = self.layer_norm1(x.transpose(2, 3)).transpose(2, 3)
        out = self.cnn1(F.gelu(out))
        out = self.layer_norm2(out.transpose(2, 3)).transpose(2, 3)
        out = self.cnn2(F.gelu(out))
        return out + x


class TorchRecurrentBlock(tnn.Module):
    def __init__(self, hidden):
        super().__init__()
        self.rnn = tnn.GRU(hidden, hidden, num_layers=1, batch_first=False)
        self.layer_norm = tnn.LayerNorm(hidden)

    def forward(self, x):  # (T, B, H)
        out = F.gelu(self.layer_norm(x))
        out, _ = self.rnn(out)
        return out


class TorchDeepSpeech2(tnn.Module):
    """Reference deepspeech2.py:90-195 architecture (test fixture, no
    dropout — eval comparison)."""

    def __init__(self, in_channels, n_res, n_rnn, hidden, n_classes, n_feat,
                 adapter_out=None):
        super().__init__()
        if adapter_out is not None:
            self.adapter = tnn.Sequential(
                tnn.LayerNorm(n_feat), tnn.Linear(n_feat, adapter_out),
                tnn.LayerNorm(adapter_out), tnn.Linear(adapter_out, adapter_out),
            )
            n_feat = adapter_out
        else:
            self.adapter = None
        self.cnn = tnn.Conv2d(in_channels, 32, 3, 1, padding=1)
        self.residual_layers = tnn.ModuleList(
            [TorchResidualCNN(32, n_feat) for _ in range(n_res)]
        )
        self.linear = tnn.Linear(n_feat * 32, hidden)
        self.recurrent_layers = tnn.ModuleList(
            [TorchRecurrentBlock(hidden) for _ in range(n_rnn)]
        )
        self.feature_extractor = tnn.Sequential(tnn.Linear(hidden, hidden), tnn.GELU())
        self.classifier = tnn.Linear(hidden, n_classes)

    def forward(self, x, voicing=None):  # (B, C, D, T)
        if self.adapter is not None:
            x = self.adapter(x.transpose(3, 2)).transpose(3, 2)
        out = self.cnn(x)
        if voicing is not None:
            out = out + voicing.unsqueeze(1).unsqueeze(1)
        for layer in self.residual_layers:
            out = layer(out)
        b, c, d, t = out.shape
        out = out.view(b, c * d, t).permute(2, 0, 1)  # (T, B, C*D)
        out = self.linear(out)
        for layer in self.recurrent_layers:
            out = layer(out)
        out = out.permute(1, 0, 2)  # (B, T, H)
        feats = self.feature_extractor(out)
        return self.classifier(feats), feats


def _state_dict_names(t_model):
    """Rename fixture keys to the reference layout consumed by the
    converter (adapter.adapter.N...)."""
    sd = {}
    for k, v in t_model.state_dict().items():
        if k.startswith("adapter."):
            k = "adapter." + k  # adapter.0.weight -> adapter.adapter.0.weight
        sd[k] = v.detach().numpy()
    return sd


@pytest.mark.parametrize("adapter_out", [None, 12])
def test_deepspeech2_matches_torch(adapter_out):
    n_res, n_rnn, hidden, n_classes, n_feat = 2, 2, 16, 9, 20
    torch.manual_seed(0)
    t_model = TorchDeepSpeech2(2, n_res, n_rnn, hidden, n_classes, n_feat,
                               adapter_out=adapter_out).eval()
    x = torch.randn(2, 2, n_feat, 10)
    voicing = torch.rand(2, 10)
    with torch.no_grad():
        ref_logits, ref_feats = t_model(x, voicing)

    params = convert_deepspeech2_state_dict(
        _state_dict_names(t_model), num_residual_layers=n_res, num_rnn_layers=n_rnn
    )
    model = DeepSpeech2(
        in_channels=2,
        num_residual_layers=n_res,
        num_rnn_layers=n_rnn,
        rnn_hidden_size=hidden,
        num_classes=n_classes,
        num_features=n_feat,
        adapter_out_features=adapter_out,
    )
    logits, feats = model.apply(
        {"params": params},
        jnp.asarray(x.numpy()),
        voicing=jnp.asarray(voicing.numpy()),
        return_features=True,
    )
    np.testing.assert_allclose(
        np.asarray(feats), ref_feats.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-3, atol=1e-4
    )
