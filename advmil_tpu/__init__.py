"""AdvMIL-TPU: a TPU-native (JAX/XLA/Pallas/pjit) adversarial multiple-instance
learning framework for survival analysis on whole-slide images.

Re-designed from scratch with the capability surface of liupei101/AdvMIL
(reference mounted at /root/reference), but built TPU-first:

- ragged bags are bucketed into padded, masked [B, N, C] batches (the reference
  uses batch_size=1 + 16-step gradient accumulation; see
  reference model/model_handler.py:301-347),
- models are pure flax modules, the adversarial D-step/G-step is ONE jitted
  function with two optax states,
- data parallelism is a jax.sharding Mesh over the batch axis,
- the hot attention ops are Pallas TPU kernels.
"""

__version__ = "0.1.0"
