"""evcont_tpu: TPU-native eigenvector continuation for ab initio MD.

See README.md for the architecture and PARITY.md for the component map
against the upstream reference.
"""

__version__ = "0.1.0"

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
    if name == "TRDMIngestBackend":
        from .backends.trdm_ingest import TRDMIngestBackend
        return TRDMIngestBackend
    if name == "converge_EVCont_MD":
        from .learn.active import converge_EVCont_MD
        return converge_EVCont_MD
    raise AttributeError(name)
