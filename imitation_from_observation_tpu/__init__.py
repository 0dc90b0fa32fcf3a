"""imitation_from_observation_tpu — a TPU-native (JAX/XLA/Pallas) framework
with the capabilities of wyndwarrior/imitation_from_observation.

The reference implements "Imitation from Observation: Learning to Imitate
Behaviors from Raw Video via Context Translation" (arXiv 1707.03374) as a
three-stage pipeline (demo generation -> context-translation model training ->
visual-reward TRPO) on top of Theano/TF1 + a forked gym + MuJoCo 1.31.

This package re-designs that pipeline TPU-first:

- ``core``            typed configs, logging, checkpointing, PRNG utilities
- ``ops``             TF1-compatible conv/deconv/linear primitives + Pallas kernels
- ``models``          context-translation model zoo (flax), losses
- ``parallel``        device mesh / sharding helpers (pjit data parallelism)
- ``video``           demo-video ingestion (native decode -> fused preprocessing)
- ``train``           translation-model trainer (data-parallel Adam over ICI)
- ``sim``             MuJoCo-3 task environments + vectorized executor
- ``reward``          batched visual reward engine (feature + pixel L2)
- ``rl``              jittable TRPO/VPG, policies, baselines, GAE
- ``baselines_tpil``  third-person imitation / GAIL discriminator baselines
- ``exp``             experiment launchers, metrics plotting
"""

__version__ = "0.1.0"
