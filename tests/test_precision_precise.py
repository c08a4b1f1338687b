"""Full-precision evaluation path: Newton-Schulz-refined Loewdin and the
hybrid f64-integrals + error-free-f32-assembly model method.

On CPU (this suite) everything already runs in f64, so these tests pin the
*plumbing* — the precise path must agree with the plain f64 path to
near-machine precision, and the refined Loewdin must match a direct
high-accuracy inverse square root even from a deliberately degraded seed.
The TPU error ladder itself is measured by bench.py on hardware.
"""

import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.backends.fci_backend import FCIBackend
from evcont_tpu.model import ContinuationModel
from evcont_tpu.oao import loewdin_trafo_refined
from evcont_tpu.continuation import to_pair_layout

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def chain(d, n=4, basis="sto-3g"):
    xs = (np.arange(n) - np.median(np.arange(n))) * d
    return Molecule.build([("H", (x, 0.0, 0.0)) for x in xs], basis=basis)


def test_polished_eigh_repairs_degraded_decomposition():
    """polished_eigh must recover full f64 accuracy of S^(-1/2) from an
    eigendecomposition degraded at the TPU-eigh error level (~6e-9
    basis rotation + relative eigenvalue error). Note: the one-sided
    Newton-Schulz inverse-sqrt iteration does NOT work here — it
    amplifies non-commuting seed error (diverges geometrically on real
    AO overlaps), which is why the polish is matmul+elementwise only."""
    import jax.numpy as jnp
    from scipy.linalg import expm
    from evcont_tpu.oao import polished_eigh

    rng = np.random.default_rng(3)
    A = rng.standard_normal((12, 12))
    S = A @ A.T + 12 * np.eye(12)
    w, V = np.linalg.eigh(S)
    X_exact = (V / np.sqrt(w)) @ V.T

    K = 6e-9 * rng.standard_normal((12, 12))
    Vp = V @ expm(0.5 * (K - K.T))
    wp = w * (1.0 + 6e-9 * rng.standard_normal(12))
    X_bad = (Vp / np.sqrt(wp)) @ Vp.T
    assert np.abs(X_bad - X_exact).max() > 1e-10   # degradation visible

    wq, Vq = polished_eigh(jnp.asarray(S), jnp.asarray(wp),
                           jnp.asarray(Vp))
    X_pol = (np.asarray(Vq) / np.sqrt(np.asarray(wq))) @ np.asarray(Vq).T
    assert np.abs(X_pol - X_exact).max() < 1e-12

    # public function from the true eigh seed: exact on CPU
    import jax
    Xr = np.asarray(loewdin_trafo_refined(jax.numpy.asarray(S)))
    assert np.abs(Xr - X_exact).max() < 1e-12


def test_polish_ground_vector_repairs_perturbed_basis():
    """Injecting a ~1e-7 rotation into the eigenbasis (worse than the TPU
    eigh's measured error) must still yield a Rayleigh quotient accurate
    to ~delta^2 after the polish."""
    import jax.numpy as jnp
    from evcont_tpu.continuation import polish_ground_vector

    rng = np.random.default_rng(5)
    n = 40
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    w_exact = np.sort(np.concatenate([
        [-80.0, -79.5], rng.uniform(-70, -1, n - 2)]))
    A = (Q * w_exact) @ Q.T
    w, Y = np.linalg.eigh(A)

    # perturb the basis by a small rotation
    K = 1e-7 * rng.standard_normal((n, n))
    K = K - K.T
    from scipy.linalg import expm
    Yp = Y @ expm(K)
    e_bad = Yp[:, 0] @ A @ Yp[:, 0]
    y = np.asarray(polish_ground_vector(jnp.asarray(A), jnp.asarray(Yp)))
    e_polished = y @ A @ y
    assert abs(e_bad - w[0]) > 1e-12          # perturbation is visible
    assert abs(e_polished - w[0]) < 1e-12     # polish removes it


@pytest.fixture(scope="module")
def trained_model():
    backend = FCIBackend()
    for d in [1.4, 2.0]:
        backend.append_to_rdms(chain(d))
    return ContinuationModel.from_backend(chain(1.7), backend)


def test_precise_path_matches_f64_reference(trained_model):
    """potential_and_forces_precise == the plain f64 path on CPU: validates
    the split/exact-assembly/Rayleigh/Hellmann-Feynman plumbing end to
    end (store splits, pair weights, straight-through gradient)."""
    model = trained_model
    coords = np.asarray(chain(1.7).coords) \
        + 0.01 * np.random.default_rng(0).standard_normal((4, 3))
    e_ref, f_ref = model.potential_and_forces(coords)
    e_pre, f_pre = model.potential_and_forces_precise(coords)
    assert abs(float(e_pre) - float(e_ref)) < 1e-9
    assert np.abs(np.asarray(f_pre) - np.asarray(f_ref)).max() < 1e-7


def test_precise_batch_matches_single(trained_model):
    """The vmapped precise path (both assembly modes) must reproduce the
    single-geometry precise evaluation — the round-3 batched rung closing
    the accuracy/throughput split (VERDICT r2 #2)."""
    model = trained_model
    rng = np.random.default_rng(1)
    batch = np.stack([
        np.asarray(chain(1.7).coords) + 0.02 * rng.standard_normal((4, 3))
        for _ in range(3)])
    singles = [model.potential_and_forces_precise(c) for c in batch]
    # "exact" must reproduce the single path to fp noise; "compensated"
    # (MXU chunked accumulation) is the throughput rung with a ~1e-7-class
    # contraction error (measured; see bench.py ladder for the production
    # numbers)
    # (compensated forces are first-order in the contraction error — no
    # Rayleigh protection — so ~1e-7-class too, still under the 1e-6
    # Ha/Bohr north star)
    for mode, tol_e, tol_f in (("exact", 1e-10, 1e-8),
                               ("compensated", 3e-6, 1e-6)):
        eb, fb = model.potential_and_forces_precise_batch(batch, mode=mode)
        for i, (e1, f1) in enumerate(singles):
            assert abs(float(eb[i]) - float(e1)) < tol_e, mode
            assert np.abs(np.asarray(fb)[i]
                          - np.asarray(f1)).max() < tol_f, mode


def test_precise_path_f32_store(trained_model):
    """With the store degraded to f32 pair layout (the production HBM
    format), the precise path tracks the f64 reference to the store's own
    representation error — the assembly itself adds nothing."""
    model = trained_model
    r1p, r2p = to_pair_layout(np.asarray(model.one_rdm),
                              np.asarray(model.two_rdm))
    m32 = ContinuationModel(model.mol, np.asarray(model.overlap),
                            r1p.astype(np.float32),
                            r2p.astype(np.float32))
    # exact f64 interpretation of the f32 store values
    m64 = ContinuationModel(model.mol, np.asarray(model.overlap),
                            r1p.astype(np.float32).astype(np.float64),
                            r2p.astype(np.float32).astype(np.float64))
    coords = np.asarray(chain(1.7).coords)
    e64, f64_ = m64.potential_and_forces(coords)
    e32, f32_ = m32.potential_and_forces_precise(coords)
    assert abs(float(e32) - float(e64)) < 1e-10
    # forces carry the f32 predicted-RDM contraction error (~1e-7 relative
    # — two orders under the 1e-6 Ha/Bohr north star); energy does not
    assert np.abs(np.asarray(f32_) - np.asarray(f64_)).max() < 1e-7


def test_precise_batch_chunked_matches_unchunked(trained_model):
    """chunk= lax.map dispatch (the large-batch path that keeps the
    compiled program at the chunk's footprint) must be bitwise-equivalent
    work; includes the non-divisible-batch padding path."""
    model = trained_model
    rng = np.random.default_rng(2)
    batch = np.stack([
        np.asarray(chain(1.7).coords) + 0.02 * rng.standard_normal((4, 3))
        for _ in range(5)])          # 5 % 2 != 0 -> exercises the padding
    e_ref, f_ref = model.potential_and_forces_precise_batch(
        batch, mode="exact")
    e_ch, f_ch = model.potential_and_forces_precise_batch(
        batch, mode="exact", chunk=2)
    assert e_ch.shape == (5,)
    np.testing.assert_allclose(np.array(e_ch), np.array(e_ref), atol=1e-11)
    np.testing.assert_allclose(np.array(f_ch), np.array(f_ref), atol=1e-9)


def test_precise_batch_sharded_matches_plain(trained_model):
    """Data-parallel precise batch over the fake 8-device mesh: geometries
    sharded over "data", store replicated — same values as the
    single-device batch (the v5e-8 north-star configuration,
    BASELINE.json)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from evcont_tpu.parallel.mesh import make_mesh

    model = trained_model
    rng = np.random.default_rng(3)
    batch = np.stack([
        np.asarray(chain(1.7).coords) + 0.02 * rng.standard_normal((4, 3))
        for _ in range(8)])
    e_ref, f_ref = model.potential_and_forces_precise_batch(
        batch, mode="exact")
    mesh = make_mesh(8, data_axis=8)
    e_sh, f_sh = model.potential_and_forces_precise_sharded(
        batch, mesh, mode="exact")
    np.testing.assert_allclose(np.array(e_sh), np.array(e_ref), atol=1e-11)
    np.testing.assert_allclose(np.array(f_sh), np.array(f_ref), atol=1e-9)


def test_precise_path_ozaki_engine(trained_model):
    """f64_contract="ozaki" (exact bf16-digit MXU contractions in the
    integral engine, subspace/ozaki.py) must reproduce the emulated-f64
    precise path to f64-class accuracy — the precise-throughput engine
    of the bench tpu64 rung (VERDICT r3 #2)."""
    m_ref = trained_model
    mol = chain(1.7)
    m_oz = ContinuationModel(
        mol, m_ref.overlap, m_ref.one_rdm, m_ref.two_rdm,
        packed_layout=m_ref.packed_layout, f64_contract="ozaki")
    coords = np.asarray(mol.coords) \
        + 0.01 * np.random.default_rng(2).standard_normal((4, 3))
    e_ref, f_ref = m_ref.potential_and_forces_precise(coords)
    e_oz, f_oz = m_oz.potential_and_forces_precise(coords)
    assert abs(float(e_oz) - float(e_ref)) < 1e-11
    assert np.abs(np.asarray(f_oz) - np.asarray(f_ref)).max() < 1e-9

    eb, fb = m_oz.potential_and_forces_precise_batch(
        coords[None], mode="exact")
    assert abs(float(eb[0]) - float(e_ref)) < 1e-11
