"""coldrec_tpu — a TPU-native cold-start recommendation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the ColdRec
research toolkit (reference: YuanchenBei/ColdRec): 26 cold-start /
collaborative-filtering models behind one trainer contract, a warm/cold
split protocol, and a three-way (overall / cold / warm) ranking
evaluation protocol.

Architecture (TPU-first, not a port):
  - ``coldrec_tpu.data``     host-side protocol kernel: splits, id remap,
                             padded static-shape graph/eval structures.
  - ``coldrec_tpu.ops``      device compute: losses, segment-sum SpMM,
                             masked top-k retrieval, k-means, Pallas kernels.
  - ``coldrec_tpu.parallel`` mesh construction + sharding conventions.
  - ``coldrec_tpu.runtime``  trainer runtime (run / fast_evaluation /
                             early stop / checkpoint bus).
  - ``coldrec_tpu.models``   model zoo (MF, LightGCN, ..., cold-start
                             generators), registered in AVAILABLE_MODELS.
"""

__version__ = "0.1.0"
