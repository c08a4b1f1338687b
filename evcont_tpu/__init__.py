"""evcont_tpu: TPU-native eigenvector continuation for ab initio MD.

See README.md for the architecture and PARITY.md for the component map
against the upstream reference.
"""

__version__ = "0.1.0"

import os as _os

# On TPU, XLA's default matmul precision feeds float32 operands through the
# MXU as bfloat16 (~8 mantissa bits). Quantum-chemistry contractions feeding
# a generalized eigensolve with near-singular training overlaps amplify that
# to multi-Hartree errors (measured: 5 Ha on the H6 continuation). Scientific
# correctness wins by default; set EVCONT_TPU_FAST_MATMUL=1 before import to
# opt back into fast bf16 matmuls for throughput experiments.
if not _os.environ.get("EVCONT_TPU_FAST_MATMUL"):
    import jax as _jax
    _jax.config.update("jax_default_matmul_precision", "highest")

# persistent XLA compilation cache: the integral-engine graphs dominate
# cold-start wall time (minutes per molecule shape) and are identical
# across runs; opt out with EVCONT_TPU_NO_COMPILE_CACHE=1
if not _os.environ.get("EVCONT_TPU_NO_COMPILE_CACHE"):
    import jax as _jax
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("EVCONT_TPU_COMPILE_CACHE",
                        _os.path.expanduser("~/.cache/evcont_tpu_jax_cache")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from .molecule import Molecule
from .config import RunConfig

__all__ = [
    "Molecule",
    "RunConfig",
    "__version__",
]


def __getattr__(name):
    # lazy imports keep `import evcont_tpu` light (jax loads on demand)
    if name == "ContinuationModel":
        from .model import ContinuationModel
        return ContinuationModel
    if name == "IntegralEngine":
        from .integrals.engine import IntegralEngine
        return IntegralEngine
    if name == "FCIBackend":
        from .backends.fci_backend import FCIBackend
        return FCIBackend
    if name == "CASCIBackend":
        from .backends.casci_backend import CASCIBackend
        return CASCIBackend
    if name == "DMRGBackend":
        from .backends.dmrg_backend import DMRGBackend
        return DMRGBackend
    if name == "TRDMIngestBackend":
        from .backends.trdm_ingest import TRDMIngestBackend
        return TRDMIngestBackend
    if name == "converge_EVCont_MD":
        from .learn.active import converge_EVCont_MD
        return converge_EVCont_MD
    raise AttributeError(name)
