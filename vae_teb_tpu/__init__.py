"""vae_teb_tpu — TPU-native framework for scattering-transform sequence VAEs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the VAE-TEB
reference (Mahdi-Si/VAE-TEB): 1-D wavelet scattering with phase-harmonic
correlation frontends, HDF5 dataset tooling, sequence-VAE model families with
Target-Encoder-Bank conditioning, data-parallel training over TPU meshes, and
the transfer-entropy / causality evaluation suite.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  ops/       — filter banks + scattering / phase-correlation transforms (jit)
  models/    — flax model families (SeqVaeTeb, variants, InceptionTime)
  data/      — HDF5 schema, stats, normalization, host ingest pipeline
  parallel/  — mesh construction + sharding policy
  train/     — jitted train/eval steps, schedules, checkpointing
  eval/      — transfer entropy, VAF/MSE/SNR metrics, causality analyses
  serve.py   — jax.export serving artifacts + streaming encode sessions
"""

__version__ = "0.1.0"
