"""Test configuration: run everything on CPU in float64 with a fake
8-device mesh for multi-chip sharding tests.

Note: the axon sitecustomize force-registers the TPU plugin and sets
jax_platforms=axon at import time, so the platform must be overridden via
jax.config *after* importing jax (env vars alone are ignored).
"""

import os

# must be set before the backend initializes
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the integral-engine graphs dominate test
# wall time and are identical across runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/evcont_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def cached_bundle(mol):
    """Disk-cached integral bundle (ovlp, hcore, eri, enuc f64 arrays) for
    expensive test molecules — the cc-pVTZ H2O graph alone costs ~3 min of
    the suite per run (trace + cache-load + execute on one CPU core).

    Correctness-preserving: the key hashes every source file under
    evcont_tpu/integrals/ plus the molecule (symbols, basis, charge, spin,
    geometry), so any engine change invalidates the cached values and the
    next run recomputes and re-validates."""
    import glob
    import hashlib

    import numpy as np

    from evcont_tpu.integrals import engine as engine_mod
    from evcont_tpu.integrals.engine import IntegralEngine

    srcdir = os.path.dirname(os.path.abspath(engine_mod.__file__))
    h = hashlib.sha256()
    for f in sorted(glob.glob(os.path.join(srcdir, "*.py"))):
        with open(f, "rb") as fh:
            h.update(fh.read())
    h.update(repr((tuple(mol.symbols), mol.basis, mol.charge,
                   mol.spin)).encode())
    h.update(np.ascontiguousarray(np.asarray(mol.coords,
                                             dtype=np.float64)).tobytes())
    cdir = os.path.expanduser("~/.cache/evcont_tpu_test_bundles")
    path = os.path.join(cdir, h.hexdigest() + ".npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return (z["ovlp"], z["hcore"], z["eri"], float(z["enuc"]))
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    ovlp, hcore = np.asarray(b.ovlp), np.asarray(b.hcore)
    eri, enuc = np.asarray(b.eri), float(b.enuc)
    os.makedirs(cdir, exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, ovlp=ovlp, hcore=hcore, eri=eri, enuc=enuc)
    os.replace(tmp, path)
    return ovlp, hcore, eri, enuc
