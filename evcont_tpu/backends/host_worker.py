"""Host-process training backend: run an expensive training-state solver
(DMRG/FCI/CASCI) in a persistent CPU-f64 worker subprocess while the
parent process keeps the accelerator for inference and MD.

This is the TPU-native form of the reference's job-array training pattern
(scripts/MD/Zundel_thermodynamics/continuation/02_run_DMRG.py:22,
03_evaluate_MPS_t_RDMs.py:35-36 — training solves farmed out to separate
CPU processes, t-RDMs exchanged through files): the worker holds the real
backend object (including its MPS/CI wavefunction state) in memory and in
full float64, the parent mirrors only the grown t-RDM store, and the
active-learning MD/selection loop in the parent runs jitted on the
accelerator in its own precision. JAX's platform and x64 flags are global
per process, which is exactly why the training solver gets its own
process.

Protocol: JSON lines on the worker's stdin/stdout. Responses are prefixed
with a sentinel so solver progress prints cannot corrupt the channel.
Array payloads (the new store row per append) travel through .npz files
under the backend workdir — the same medium the reference uses between
its pipeline stages.
"""

import json
import os
import subprocess
import sys

import numpy as np

from .base import EVContBackend

_SENTINEL = "##EVC##"


class HostWorkerBackend(EVContBackend):
    """Duck-typed EVCont backend whose append/prune calls execute inside a
    persistent CPU-f64 subprocess running `factory(**kwargs)`.

    The worker pickles its full training state (wavefunctions included) to
    `<workdir>/solver_state.pkl` after every append, so a crashed
    active-learning run resumes without re-solving: construct with
    resume=True and the worker reloads the snapshot while the parent
    re-mirrors the grown store.

    Args:
        factory: "module.path:ClassName" of the real backend, e.g.
            "evcont_tpu.backends.dmrg_backend:DMRGBackend".
        kwargs: JSON-serializable constructor kwargs for the real backend.
        workdir: directory for the worker config, row payloads, and log.
        compress: mirror the store in the fully compressed pair + exchange
            layouts (pass compress=True in `kwargs` too to keep the
            worker-side store small as well).
        resume: reload `<workdir>/solver_state.pkl` into the worker and
            re-mirror its store (raises if the snapshot is missing).
    """

    def __init__(self, factory, kwargs=None, workdir=".", compress=False,
                 resume=False):
        super().__init__(compress=compress)
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        cfg_path = os.path.join(workdir, "host_worker_cfg.json")
        with open(cfg_path, "w") as fh:
            json.dump({"factory": factory, "kwargs": kwargs or {}}, fh)
        self._log = open(os.path.join(workdir, "host_worker.log"), "ab")
        self._proc = subprocess.Popen(
            [sys.executable, "-m", "evcont_tpu.backends.host_worker",
             cfg_path],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=self._log, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
        if resume:
            resp = self._rpc({"cmd": "load"})
            with np.load(resp["store_npz"]) as st:
                ov, r1, r2 = st["overlap"], st["one_rdm"], st["two_rdm"]
            os.remove(resp["store_npz"])
            if self.compress and r1.ndim == 4:
                # worker snapshot kept full layouts; compress host-side in
                # f64 (to_pair_layout's device path would downcast on a
                # non-x64 parent)
                from .base import _pack_exchange
                rows, cols = np.tril_indices(ov.shape[0])
                r1 = r1[rows, cols]
                r2 = np.stack([_pack_exchange(r) for r in r2[rows, cols]])
            self.overlap, self.one_rdm, self.two_rdm = ov, r1, r2
            self.ens = list(resp["ens"])
            self.mol_index = list(resp["mol_index"])

    def _rpc(self, obj):
        self._proc.stdin.write(json.dumps(obj) + "\n")
        self._proc.stdin.flush()
        while True:
            line = self._proc.stdout.readline()
            if not line:
                raise RuntimeError(
                    f"host worker died (see {self.workdir}/host_worker.log)")
            if line.startswith(_SENTINEL):
                resp = json.loads(line[len(_SENTINEL):])
                if not resp.get("ok"):
                    raise RuntimeError(f"host worker error: {resp.get('error')}")
                return resp

    def append_to_rdms(self, mol):
        resp = self._rpc({
            "cmd": "append",
            "atoms": [[s, [float(x) for x in xyz]]
                      for s, xyz in zip(mol.symbols, np.asarray(mol.coords))],
            "basis": mol.basis, "charge": mol.charge, "spin": mol.spin,
        })
        with np.load(resp["row_npz"]) as row:
            self._grow(list(row["ovlp"]), list(row["rdm1"]),
                       list(row["rdm2"]))
        os.remove(resp["row_npz"])
        self.ens = list(resp["ens"])
        self.mol_index = list(resp["mol_index"])

    def prune_datapoints(self, keep_ids):
        keep_ids = [int(i) for i in keep_ids]
        self._rpc({"cmd": "prune", "keep_ids": keep_ids})
        super().prune_datapoints(keep_ids)

    def close(self):
        if self._proc.poll() is None:
            try:
                self._rpc({"cmd": "quit"})
            except RuntimeError:
                pass
            self._proc.wait(timeout=30)
        self._log.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _worker_main():
    cfg_path = sys.argv[1]
    # platform/x64 config must precede any backend computation; the axon
    # sitecustomize ignores JAX_PLATFORMS, so use jax.config (see
    # tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/evcont_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import importlib

    from ..molecule import Molecule

    with open(cfg_path) as fh:
        cfg = json.load(fh)
    mod_name, cls_name = cfg["factory"].split(":")
    backend = getattr(importlib.import_module(mod_name), cls_name)(
        **cfg["kwargs"])
    workdir = os.path.dirname(os.path.abspath(cfg_path))
    state_pkl = os.path.join(workdir, "solver_state.pkl")

    def reply(obj):
        sys.stdout.write(_SENTINEL + json.dumps(obj) + "\n")
        sys.stdout.flush()

    def persist():
        import pickle
        tmp = state_pkl + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(backend.snapshot(), fh, protocol=4)
        os.replace(tmp, state_pkl)

    def new_row():
        """(ovlp, rdm1, rdm2) of the newest state vs all states, for either
        store layout (compressed: the last ntrain pair entries ARE the new
        tril row)."""
        n = backend.ntrain
        if getattr(backend, "compress", False):
            return (backend.overlap[-1], backend.one_rdm[-n:],
                    backend.two_rdm[-n:])
        return (backend.overlap[-1], backend.one_rdm[-1],
                backend.two_rdm[-1])

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            cmd = json.loads(line)
            if cmd["cmd"] == "quit":
                reply({"ok": True})
                return
            if cmd["cmd"] == "append":
                mol = Molecule.build(
                    [(s, tuple(xyz)) for s, xyz in cmd["atoms"]],
                    basis=cmd["basis"], charge=cmd["charge"],
                    spin=cmd["spin"], unit="Bohr")
                backend.append_to_rdms(mol)
                persist()
                ovlp, rdm1, rdm2 = new_row()
                row_npz = os.path.join(
                    workdir, f"row_{backend.ntrain - 1}.npz")
                np.savez(row_npz, ovlp=ovlp, rdm1=rdm1, rdm2=rdm2)
                reply({"ok": True, "row_npz": row_npz,
                       "ens": [float(e) for e in backend.ens],
                       "mol_index": [int(i) for i in backend.mol_index]})
            elif cmd["cmd"] == "prune":
                backend.prune_datapoints(cmd["keep_ids"])
                persist()
                reply({"ok": True})
            elif cmd["cmd"] == "load":
                import pickle
                with open(state_pkl, "rb") as fh:
                    backend.restore(pickle.load(fh))
                store_npz = os.path.join(workdir, "resume_store.npz")
                np.savez(store_npz, overlap=backend.overlap,
                         one_rdm=backend.one_rdm, two_rdm=backend.two_rdm)
                reply({"ok": True, "store_npz": store_npz,
                       "ens": [float(e) for e in backend.ens],
                       "mol_index": [int(i) for i in backend.mol_index]})
            else:
                reply({"ok": False, "error": f"unknown cmd {cmd['cmd']}"})
        except Exception as exc:  # report, keep serving
            import traceback
            traceback.print_exc(file=sys.stderr)
            sys.stderr.flush()
            reply({"ok": False, "error": repr(exc)})


if __name__ == "__main__":
    _worker_main()
