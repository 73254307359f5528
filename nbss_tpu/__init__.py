"""nbss_tpu — a TPU-native multichannel speech separation / enhancement framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Audio-WestlakeU/NBSS
(narrow-band speech separation: NB-BLSTM, NBC, NBC2, SpatialNet, Online
SpatialNet), designed TPU-first:

- All compute paths are jit-compiled XLA programs with static shapes.
- Activations use the canonical ``[B, F, T, H]`` layout (hidden last = lane dim)
  so matmuls/attention land on the MXU with ``B*F`` (or ``B*T``) batching.
- Streaming paths are ``lax.scan`` state machines, never Python frame loops.
- Multi-chip scaling is `jax.sharding.Mesh` + NamedSharding data parallelism
  (gradients reduced by XLA collectives over ICI), not NCCL/DDP.

Subpackages
-----------
- ``nbss_tpu.io``       STFT/iSTFT, input normalization, cIRM, losses
- ``nbss_tpu.ops``      pure-JAX signal ops & metrics (SI-SDR, uPIT, ...)
- ``nbss_tpu.models``   network architectures (SpatialNet, NBC, NBC2, NB-BLSTM)
- ``nbss_tpu.train``    training module / loops / optimizers / checkpointing
- ``nbss_tpu.parallel`` device mesh + sharding policies
- ``nbss_tpu.data``     deterministic (index, seed) data pipeline
- ``nbss_tpu.eval``     evaluation metrics and host-side metric bridges
"""

__version__ = "0.1.0"
