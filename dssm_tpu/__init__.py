"""dssm_tpu — a TPU-native DSSM (two-tower semantic matching) framework.

Brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of the
reference repo MC-Zealot/dssm (see SURVEY.md; reference mount was empty —
capability contract is BASELINE.json's five configs):

  1. Tiny DSSM  — 30k letter-trigram hash, 300-300-128 MLP towers, CPU-runnable
  2. Full DSSM  — 500k trigram vocab, in-batch negatives (batch 1024)
  3. CNN-DSSM   — convolutional towers with max-pooling (CLSM)
  4. LSTM-DSSM  — recurrent towers with final-state embeddings
  5. Multi-host — sharded embedding table + global negative pool via all-gather

Layering (each layer depends only downward):

  cli/       entry points (train, eval, bench) + presets
  train/     train loop, TrainState, eval harness (Recall@K / NDCG@K)
  models/    tower definitions (pure functions): mlp, cnn, lstm
  loss/      in-batch-negative cosine-softmax loss (+ rotation-parity mode)
  parallel/  mesh, sharding rules, all-gather negative pool, sharded embedding
  kernels/   Pallas TPU kernels with XLA fallbacks for every kernel
  data/      letter-trigram hashing, toy dataset, batching, sharded loading
  io/        checkpointing (orbax), JSONL metrics
  config/    frozen dataclass configs; the five named presets
  oracle/    numpy oracle of the reference-family math (parity target)
"""

__version__ = "0.1.0"
