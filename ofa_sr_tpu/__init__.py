"""ofa_sr_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
twice154/ofa-for-super-resolution (the "ofa-for-super-resolution_tpu" rebuild).

A weight-shared "once-for-all" supernet for joint image downscaling and
super-resolution, with four elastic dimensions (kernel size, depth, expand
ratio, pixelshuffle depth), progressive-shrinking training, knowledge
distillation, subnet materialization, and NAS search — redesigned TPU-first:

- All compute is functional JAX in NHWC layout; parameters are explicit
  pytrees ("weight banks") held at maximum shape in HBM.
- Supernet training uses *masked execution at max shape* so a single compiled
  XLA program serves every sampled subnet (no per-subnet recompiles); the two
  pixelshuffle depths are the only structural branch (`lax.cond`).
- Deployment materializes a sliced, static subnet and jits the true small
  network (the fixed reimplementation of the reference's broken
  `get_active_subnet`, ofa/elastic_nn/networks/ofa_mbs4.py:373-458).
- Data parallelism is `jax.sharding.Mesh` + jit with sharding annotations
  (XLA inserts the ICI collectives), replacing the reference's
  nn.DataParallel / Horovod (SURVEY.md §2.8).
"""

__version__ = "0.1.0"
