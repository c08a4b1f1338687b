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

Backends constructed with compress=True maintain the fully compressed
layouts instead (the reference's "both symmetries" case,
ab_initio_eigenvector_continuation.py:41-71 / 03_Zundel...:110):
one_rdm (Npair, n, n), two_rdm (Npair, n^2(n^2+1)/2) with
Npair = Ntrn(Ntrn+1)/2. This is the production layout: the full 6-d
Zundel-84 store is 35 GB f64, the compressed one 8.8 GB, and the device
models consume the compressed layouts directly. Only valid for the
hermitian path (the (b, a) direction of the t-RDMs is discarded).
"""

import numpy as np


def _pack_exchange(rdm2):
    """Host-side electron-exchange compression of one (n,n,n,n) t-RDM to
    its (n^2(n^2+1)/2,) lower triangle over combined indices (values
    unscaled; the assembly applies the 0.5 diagonal factor to h2)."""
    rdm2 = np.asarray(rdm2)
    if rdm2.ndim == 1:          # already packed
        return rdm2
    n2 = rdm2.shape[0] if rdm2.ndim == 2 \
        else rdm2.shape[0] * rdm2.shape[1]
    flat = rdm2.reshape(n2, n2)
    rows, cols = np.tril_indices(n2)
    return flat[rows, cols]


class EVContBackend:
    """Shared storage/growth logic for training-state backends."""

    def __init__(self, compress=False):
        self.overlap = None
        self.one_rdm = None
        self.two_rdm = None
        self.ens = []
        self.mol_index = []
        self.compress = bool(compress)

    @property
    def ntrain(self):
        return 0 if self.overlap is None else self.overlap.shape[0]

    def _grow(self, ovlp_row, rdm1_row, rdm2_row):
        """Append one training state given its overlaps / t-RDMs against all
        previous states (lists including the self term last). Mirrors the
        grow-by-copy pattern of FCI_EVCont.py:106-127 (full layout) or
        appends the new tril row of pairs (compressed layout)."""
        if self.compress:
            return self._grow_compressed(ovlp_row, rdm1_row, rdm2_row)
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

    def _grow_compressed(self, ovlp_row, rdm1_row, rdm2_row):
        """Compressed-layout growth: the new state's tril row (pairs
        (new, 0..new)) lands contiguously at the end of the pair axis."""
        n_new = self.ntrain + 1
        overlap = np.ones((n_new, n_new))
        if self.overlap is not None:
            overlap[:-1, :-1] = self.overlap
        for i in range(n_new):
            overlap[-1, i] = ovlp_row[i]
            overlap[i, -1] = np.conj(ovlp_row[i])
        new_r1 = np.stack([np.asarray(r) for r in rdm1_row])
        new_r2 = np.stack([_pack_exchange(r) for r in rdm2_row])
        if self.one_rdm is None:
            self.one_rdm, self.two_rdm = new_r1, new_r2
        else:
            self.one_rdm = np.concatenate([self.one_rdm, new_r1])
            self.two_rdm = np.concatenate([self.two_rdm, new_r2])
        self.overlap = overlap

    # attributes that fully determine a backend's training state (solver
    # caches and jitted engines are rebuilt lazily after restore)
    _SNAPSHOT_ATTRS = ("overlap", "one_rdm", "two_rdm", "ens", "mol_index",
                       "compress", "states", "fcivecs", "mps_states",
                       "civecs", "rerun_states")

    def snapshot(self):
        """Picklable training state for checkpoint/resume (the wavefunction
        objects themselves, not just the t-RDM store — appending state N+1
        needs cross terms against every stored state)."""
        return {k: getattr(self, k) for k in self._SNAPSHOT_ATTRS
                if hasattr(self, k)}

    def restore(self, snap):
        for k, v in snap.items():
            setattr(self, k, v)

    def prune_datapoints(self, keep_ids):
        """Drop training states (reference: FCI_EVCont.py:133-151)."""
        keep_ids = list(keep_ids)
        if self.overlap is not None:
            ix = np.ix_(keep_ids, keep_ids)
            if self.compress:
                keep = [int(k) for k in keep_ids]
                ntrain = self.ntrain
                rows, cols = np.tril_indices(ntrain)
                pos = {(int(a), int(b)): k
                       for k, (a, b) in enumerate(zip(rows, cols))}
                sel = np.array([pos[(max(i, j), min(i, j))]
                                for k, i in enumerate(keep)
                                for j in keep[:k + 1]])
                self.one_rdm = self.one_rdm[sel]
                self.two_rdm = self.two_rdm[sel]
            else:
                self.one_rdm = self.one_rdm[ix]
                self.two_rdm = self.two_rdm[ix]
            self.overlap = self.overlap[ix]
        self.ens = [self.ens[i] for i in keep_ids]
        if self.mol_index:
            self.mol_index = [self.mol_index[i] for i in keep_ids]
