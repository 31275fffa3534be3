"""artspeech_tpu — a TPU-native articulatory speech synthesis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of vribeiro1/artspeech
(see /root/reference): predicting time-varying vocal-tract shapes (2D contours of
~11 articulators) from phoneme sequences, evaluating them geometrically (P2CP /
Euclidean / tract variables) and perceptually (DeepSpeech2 + CTC phoneme
recognition), and converting contours into air columns / area functions for
articulatory synthesis.

Subpackages
-----------
core      -- constants, dataset configs, vocabulary.
utils     -- masks, IO helpers, seeding.
ops       -- TPU compute primitives: fused GRU scans, batched cdist/P2CP,
             B-spline projection smoothing, resampling, mel spectrograms,
             CTC greedy decode.
geometry  -- tract variables, semipolar grid, vocal-tract tube, area function.
data      -- TextGrid parsing, corpus collectors, contour loading/normalization,
             bucketed fixed-shape batching for XLA.
models    -- flax models: ArtSpeech BiGRU, multi-channel transformer,
             multi-articulator autoencoder/PCA, latent RNN, DeepSpeech2.
losses    -- Euclidean, critical, composite autoencoder, CTC/CE losses.
parallel  -- device mesh + sharding layouts (dp x mp).
train     -- unified pjit train loop, checkpointing, early stopping.
eval      -- test harnesses, decoders, PER/WIL, substitution matrices.
synth     -- phoneme -> contour -> tube -> area-function synthesis pipeline.
"""

__version__ = "0.1.0"
