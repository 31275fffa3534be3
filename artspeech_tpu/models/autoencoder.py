"""Multi-articulator autoencoder and PCA encoder/decoder models.

Equivalents of reference principal_components/models/autoencoder.py:10-253:
per-articulator MLP encoders/decoders writing into a shared latent vector via
``indices_dict`` slots with max-merge, plus linear PCA variants holding
eigenvalue/eigenvector parameters (optionally whitening).

TPU notes: the per-articulator encoders are tiny (100 -> 50 -> 25 -> k) so
they are unrolled into one XLA program (a static Python loop over ~11
articulators compiles once and fuses); the slot scatter/max-merge is a
fixed gather/scatter with -inf fill, identical in semantics to reference
autoencoder.py:153-171.
"""

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from artspeech_tpu.utils.io import make_indices_dict


def normalize_indices_dict(indices_dict: Dict) -> Dict[str, List[int]]:
    """Accept {articulator: count} or {articulator: [indices]} (reference
    autoencoder.py:130-133)."""
    first = next(iter(indices_dict.values()))
    if isinstance(first, int):
        return make_indices_dict(indices_dict)
    return {k: list(v) for k, v in indices_dict.items()}


def latent_size_of(indices_dict: Dict[str, List[int]]) -> int:
    return 1 + max(i for v in indices_dict.values() for i in v)


class Encoder(nn.Module):
    """in -> hidden -> hidden//2 -> k MLP (reference autoencoder.py:82-96)."""

    num_components: int
    hidden_features: int = 50

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hidden_features)(x))
        h = nn.relu(nn.Dense(self.hidden_features // 2)(h))
        return nn.Dense(self.num_components)(h)


class Decoder(nn.Module):
    """k -> hidden//2 -> hidden -> out MLP (reference autoencoder.py:99-111)."""

    out_features: int
    hidden_features: int = 50

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.hidden_features // 2)(z))
        h = nn.relu(nn.Dense(self.hidden_features)(h))
        return nn.Dense(self.out_features)(h)


class PCAEncoder(nn.Module):
    """Linear projection onto learned/fitted eigenvectors
    (reference autoencoder.py:10-38)."""

    in_features: int
    num_components: int
    whiten: bool = False

    @nn.compact
    def __call__(self, x):
        eigenvalues = self.param(
            "eigenvalues", nn.initializers.uniform(1.0), (self.num_components,)
        )
        eigenvectors = self.param(
            "eigenvectors",
            nn.initializers.uniform(1.0),
            (self.num_components, self.in_features),
        )
        mean = self.param("mean", nn.initializers.zeros, (self.in_features,))
        z = (x - mean) @ eigenvectors.T
        if self.whiten:
            z = z / jnp.sqrt(jnp.maximum(eigenvalues, 1e-12))
        return z


class PCADecoder(nn.Module):
    """Linear unprojection (reference autoencoder.py:41-79)."""

    out_features: int
    num_components: int
    whiten: bool = False

    @nn.compact
    def __call__(self, z):
        eigenvalues = self.param(
            "eigenvalues", nn.initializers.uniform(1.0), (self.num_components,)
        )
        eigenvectors = self.param(
            "eigenvectors",
            nn.initializers.uniform(1.0),
            (self.num_components, self.out_features),
        )
        mean = self.param("mean", nn.initializers.zeros, (self.out_features,))
        if self.whiten:
            z = z * jnp.sqrt(jnp.maximum(eigenvalues, 1e-12))
        return z @ eigenvectors + mean


def _make_encoder(cls_name, in_features, num_components, hidden, name):
    if cls_name == "AE":
        return Encoder(num_components=num_components, hidden_features=hidden, name=name)
    if cls_name == "PCA":
        return PCAEncoder(
            in_features=in_features, num_components=num_components, name=name
        )
    raise ValueError(f"Unknown encoder class {cls_name}")


def _make_decoder(cls_name, out_features, num_components, hidden, name):
    if cls_name == "AE":
        return Decoder(out_features=out_features, hidden_features=hidden, name=name)
    if cls_name == "PCA":
        return PCADecoder(
            out_features=out_features, num_components=num_components, name=name
        )
    raise ValueError(f"Unknown decoder class {cls_name}")


class MultiEncoder(nn.Module):
    """Per-articulator encoders scattering into shared latent slots with
    max-merge (reference autoencoder.py:124-171).

    Input (..., Nart, in_features) -> latent (..., latent_size).
    """

    indices_dict: Dict
    in_features: int = 100
    hidden_features: int = 50
    encoder_cls: str = "AE"

    @nn.compact
    def __call__(self, x):
        indices = normalize_indices_dict(self.indices_dict)
        latent = latent_size_of(indices)
        arts = sorted(indices.keys())
        merged = jnp.full(x.shape[:-2] + (latent,), -jnp.inf, x.dtype)
        per_art = []
        for i, articulator in enumerate(arts):
            idx = jnp.asarray(indices[articulator])
            enc = _make_encoder(
                self.encoder_cls,
                self.in_features,
                len(indices[articulator]),
                self.hidden_features,
                name=f"enc_{articulator}",
            )
            z = enc(x[..., i, :])  # (..., k)
            slot = jnp.full(x.shape[:-2] + (latent,), -jnp.inf, x.dtype)
            slot = slot.at[..., idx].set(z)
            per_art.append(slot)
        return jnp.max(jnp.stack(per_art, axis=-2), axis=-2)


class MultiDecoder(nn.Module):
    """Per-articulator decoders reading their latent slots
    (reference autoencoder.py:174-211).

    Input (..., latent_size) -> (..., Nart, out_features).
    """

    indices_dict: Dict
    in_features: int = 100  # out_features per articulator (reference naming)
    hidden_features: int = 50
    decoder_cls: str = "AE"

    @nn.compact
    def __call__(self, z):
        indices = normalize_indices_dict(self.indices_dict)
        arts = sorted(indices.keys())
        outs = []
        for articulator in arts:
            idx = jnp.asarray(indices[articulator])
            dec = _make_decoder(
                self.decoder_cls,
                self.in_features,
                len(indices[articulator]),
                self.hidden_features,
                name=f"dec_{articulator}",
            )
            outs.append(dec(z[..., idx]))
        return jnp.stack(outs, axis=-2)


class MultiArticulatorAutoencoder(nn.Module):
    """tanh(latents) + decode (reference autoencoder.py:214-253)."""

    indices_dict: Dict
    in_features: int = 100
    hidden_features: int = 50
    encoder_cls: str = "AE"
    decoder_cls: str = "AE"

    def setup(self):
        self.encoders = MultiEncoder(
            indices_dict=self.indices_dict,
            in_features=self.in_features,
            hidden_features=self.hidden_features,
            encoder_cls=self.encoder_cls,
        )
        self.decoders = MultiDecoder(
            indices_dict=self.indices_dict,
            in_features=self.in_features,
            hidden_features=self.hidden_features,
            decoder_cls=self.decoder_cls,
        )

    def __call__(self, x):
        """(..., Nart, in_features) -> (recon, latents)."""
        latents = jnp.tanh(self.encoders(x))
        return self.decoders(latents), latents

    def encode(self, x):
        return jnp.tanh(self.encoders(x))

    def decode(self, z):
        return self.decoders(z)
