"""video_gcp_tpu — TPU-native framework for goal-conditioned hierarchical video
prediction and visual planning.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of orybkin/video-gcp
("Long-Horizon Visual Planning with Goal-Conditioned Hierarchical Predictors",
Pertsch*, Rybkin* et al., NeurIPS 2020). The reference implementation is
PyTorch + a torch utility library (blox); this package is a ground-up TPU-first
redesign:

- models are pure-functional flax modules; the hierarchical subgoal tree is a
  dense breadth-first array ``[B, 2^L - 1, ...]`` expanded by a level-parallel
  unrolled loop (reference: per-level Python recursion over node objects,
  gcp/prediction/utils/tree_utils.py:21-44),
- the soft-DTW frame-node matcher runs as an anti-diagonal wavefront DP on
  device (reference: gcp/prediction/models/adaptive_binding/probabilistic_dtw.py),
- data parallelism is a ``jax.sharding.Mesh`` + jit sharding annotations
  (reference: torch.nn.DataParallel), and
- hot ops (conv enc/dec, VRNN cell, cdist, DTW) target the MXU/VPU via XLA
  fusion and Pallas kernels.
"""

__version__ = "0.1.0"
