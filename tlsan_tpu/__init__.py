"""tlsan_tpu — a TPU-native sequential-recommendation engine.

A brand-new JAX/XLA/Pallas/pjit framework reproducing the capabilities of the
TLSAN reference suite (TsingZ0/TLSAN): the Amazon-reviews data pipeline, the
TLSAN model (time-aware long/short-term feature-wise attention) and its eight
baselines (ATRank, SHAN, CSAN, LSPM, PACA, CNN, Bi-LSTM, BPR-MF), trained with
sigmoid-CE / BPR losses and evaluated with pairwise AUC and P@k/R@k over the
full item catalog.

Layering (bottom-up):
  core/      configs, PRNG plumbing, mesh setup
  data/      pickle-native ETL + example builders + static-shape batching
  nn/        embedding / dense / masking substrate
  ops/       fused Pallas kernels (+ jnp reference implementations)
  models/    TLSAN + 8 baselines on the shared substrate
  parallel/  sharded embedding tables, distributed top-k, mesh utilities
  train/     jit train step, epoch loop, eval, checkpointing, metrics, CLI
"""

__version__ = "0.1.0"
