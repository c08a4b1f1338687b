"""File-based t-RDM ingestion backend.

Reference parity: the Zundel production pipeline consumes pairwise t-RDM
matrix elements computed by separate solver jobs (block2/DMRG) and stored
per training pair in directories MPS_cross_i_j/{ovlp,one_rdm,two_rdm}.npy,
with the two-body store exchange-compressed
(scripts/MD/Zundel_thermodynamics/continuation/
03_Zundel_continuation_evaluate_MPS_t_RDMs.py:108-110,
04_Zundel_continuation_MD.py:95-128). block2 itself is unavailable in this
environment, so DMRG training states enter the framework exclusively
through this file interface — any external solver that writes the schema
(block2 on a CPU cluster, or this package's own FCI via
workloads/zundel_pipeline.py) plugs in.

The loaded store uses the pair-compressed layouts directly — the sharded
production layout (parallel/mesh.py).
"""

import os

import numpy as np

from .base import EVContBackend


class TRDMIngestBackend(EVContBackend):
    """Backend whose training data is read from disk rather than computed.

    After load(), `overlap` is the full (Ntrn, Ntrn) matrix while
    one_rdm/two_rdm stay in pair-compressed layouts:
        one_rdm: (Npair, n, n)
        two_rdm: (Npair, n^2 (n^2+1)/2)   [exchange-compressed]
    which assemble_hamiltonian consumes natively.
    """

    def __init__(self):
        super().__init__()

    def append_to_rdms(self, mol):
        raise NotImplementedError(
            "TRDMIngestBackend is read-only; training states are produced "
            "by external solver jobs (see workloads/zundel_pipeline.py)")

    def load(self, rootdir, n_train, pair_dir="MPS_cross_{i}_{j}"):
        """Assemble the store from per-pair directories (Zundel 04 schema:
        lower-triangular pairs (i >= j))."""
        rows, cols = np.tril_indices(n_train)
        ovlp_packed, one_l, two_l = [], [], []
        for i, j in zip(rows, cols):
            d = os.path.join(rootdir, pair_dir.format(i=i, j=j))
            ovlp_packed.append(np.load(os.path.join(d, "ovlp.npy")))
            one_l.append(np.load(os.path.join(d, "one_rdm.npy")))
            two_l.append(np.load(os.path.join(d, "two_rdm.npy")))
        overlap = np.zeros((n_train, n_train))
        overlap[rows, cols] = np.array(ovlp_packed).reshape(-1)
        overlap = overlap + overlap.T - np.diag(np.diag(overlap))
        self.overlap = overlap
        self.one_rdm = np.stack(one_l)
        self.two_rdm = np.stack(two_l)
        return self

    def load_state_files(self, workdir, suffix=""):
        """Alternative: load the converge_EVCont_MD checkpoint artifacts
        (overlap.npy / one_rdm.npy / two_rdm.npy), full layouts
        (reference: md_H30_evcont_from_DMRG.py:72-87)."""
        from ..learn.checkpoints import load_state
        overlap, one_rdm, two_rdm, _ = load_state(workdir, suffix=suffix)
        self.overlap, self.one_rdm, self.two_rdm = overlap, one_rdm, two_rdm
        return self

    def prune_datapoints(self, keep_ids):
        if self.one_rdm is not None and self.one_rdm.ndim == 3:
            # pair-compressed layouts: rebuild the pair axis
            keep = sorted(keep_ids)
            ntrain = self.overlap.shape[0]
            rows, cols = np.tril_indices(ntrain)
            pos = {(int(a), int(b)): k for k, (a, b) in
                   enumerate(zip(rows, cols))}
            # pair order must match tril of the pruned training set
            new_ids = [(i, j) for k, i in enumerate(keep)
                       for j in keep[:k + 1]]
            sel = [pos[(max(i, j), min(i, j))] for (i, j) in new_ids]
            ix = np.ix_(keep, keep)
            self.overlap = self.overlap[ix]
            self.one_rdm = self.one_rdm[sel]
            self.two_rdm = self.two_rdm[sel]
            self.ens = [self.ens[i] for i in keep] if self.ens else []
        else:
            super().prune_datapoints(keep_ids)
