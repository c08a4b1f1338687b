"""HostWorkerBackend: a persistent CPU-f64 subprocess must mirror the real
backend's t-RDM store bitwise (the TPU-native form of the reference's
job-array training pattern, 02_run_DMRG.py:22 / 03_evaluate_MPS_t_RDMs.py).
"""

import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.backends.fci_backend import FCIBackend
from evcont_tpu.backends.host_worker import HostWorkerBackend

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def _h4(d):
    return Molecule.build([("H", (0.0, 0.0, d * i)) for i in range(4)],
                          basis="sto-3g", unit="Bohr")


@pytest.fixture(scope="module")
def worker_and_direct(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("host_worker"))
    direct = FCIBackend()
    with HostWorkerBackend(
            "evcont_tpu.backends.fci_backend:FCIBackend",
            workdir=workdir) as worker:
        for d in (1.6, 1.8, 2.1):
            mol = _h4(d)
            direct.append_to_rdms(mol)
            worker.append_to_rdms(mol)
        yield worker, direct


def test_store_mirrors_direct_backend(worker_and_direct):
    worker, direct = worker_and_direct
    assert worker.ntrain == direct.ntrain == 3
    np.testing.assert_array_equal(worker.overlap, direct.overlap)
    np.testing.assert_array_equal(worker.one_rdm, direct.one_rdm)
    np.testing.assert_array_equal(worker.two_rdm, direct.two_rdm)
    np.testing.assert_allclose(worker.ens, direct.ens, rtol=0, atol=0)


def test_prune_keeps_worker_and_mirror_in_sync(worker_and_direct):
    worker, direct = worker_and_direct
    keep = [0, 2]
    worker.prune_datapoints(keep)
    direct.prune_datapoints(keep)
    assert worker.ntrain == 2
    np.testing.assert_array_equal(worker.overlap, direct.overlap)
    np.testing.assert_array_equal(worker.two_rdm, direct.two_rdm)
    # a post-prune append still lines up
    mol = _h4(2.4)
    worker.append_to_rdms(mol)
    direct.append_to_rdms(mol)
    np.testing.assert_array_equal(worker.overlap, direct.overlap)
    np.testing.assert_array_equal(worker.one_rdm, direct.one_rdm)
