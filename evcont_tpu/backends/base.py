"""Training-state backend protocol.

The reference's EVCont objects are duck-typed around three attributes and
two methods (SURVEY.md §1 L2; FCI_EVCont.py:58,133; CASCI_EVCont.py:128,345;
DMRG_EVCont.py:462,482). The protocol is kept verbatim so the active-learning
driver works with any backend:

    backend.append_to_rdms(mol)      # grow the t-RDM store by one geometry
    backend.prune_datapoints(ids)    # keep only the listed training states
    backend.overlap                  # (Ntrn, Ntrn)
    backend.one_rdm                  # (Ntrn, Ntrn, n, n)
    backend.two_rdm                  # one of the four storage layouts
"""

import numpy as np


class EVContBackend:
    """Shared storage/growth logic for training-state backends."""

    def __init__(self):
        self.overlap = None
        self.one_rdm = None
        self.two_rdm = None
        self.ens = []
        self.mol_index = []

    @property
    def ntrain(self):
        return 0 if self.overlap is None else self.overlap.shape[0]

    def _grow(self, ovlp_row, rdm1_row, rdm2_row):
        """Append one training state given its overlaps / t-RDMs against all
        previous states (lists including the self term last). Mirrors the
        grow-by-copy pattern of FCI_EVCont.py:106-127."""
        n_new = self.ntrain + 1
        norb_shape1 = rdm1_row[0].shape
        norb_shape2 = rdm2_row[0].shape

        overlap = np.ones((n_new, n_new))
        one_rdm = np.zeros((n_new, n_new) + norb_shape1)
        two_rdm = np.zeros((n_new, n_new) + norb_shape2)
        if self.overlap is not None:
            overlap[:-1, :-1] = self.overlap
            one_rdm[:-1, :-1] = self.one_rdm
            two_rdm[:-1, :-1] = self.two_rdm
        for i in range(n_new):
            overlap[-1, i] = ovlp_row[i]
            overlap[i, -1] = np.conj(ovlp_row[i])
            one_rdm[-1, i] = rdm1_row[i]
            one_rdm[i, -1] = np.conj(rdm1_row[i])
            two_rdm[-1, i] = rdm2_row[i]
            two_rdm[i, -1] = np.conj(rdm2_row[i])
        self.overlap, self.one_rdm, self.two_rdm = overlap, one_rdm, two_rdm

    def prune_datapoints(self, keep_ids):
        """Drop training states (reference: FCI_EVCont.py:133-151)."""
        keep_ids = list(keep_ids)
        if self.overlap is not None:
            ix = np.ix_(keep_ids, keep_ids)
            self.overlap = self.overlap[ix]
            self.one_rdm = self.one_rdm[ix]
            self.two_rdm = self.two_rdm[ix]
        self.ens = [self.ens[i] for i in keep_ids]
        if self.mol_index:
            self.mol_index = [self.mol_index[i] for i in keep_ids]
