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

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (survives processes/rounds).

    The TPU tunnel in this environment compiles remotely; large eval
    programs can take minutes on first compile. The on-disk cache turns
    that into a one-time cost. Opt out with COLDREC_NO_COMP_CACHE=1.
    """
    if _os.environ.get("COLDREC_NO_COMP_CACHE"):
        return
    cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"),
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
