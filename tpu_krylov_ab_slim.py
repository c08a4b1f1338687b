"""Slim chip probe: the k=4 custom-call-free warm-Krylov MD scan
(continuation.krylov_ground_state_refine small="nocall") vs the known
eigh-scan (114.5) and k8-eigh-Krylov (120.0) rates. See
tpu_md_krylov_ab.py for the full variant matrix."""
import time
import numpy as np
import bench
import jax

model, _, nao = bench._build_model()
mol, batch1 = bench.eval_geometry(1)
c = batch1[0]
masses = mol.masses_au().astype(np.float32)
n_md = 100
dt = np.float32(5.0)
print(f"platform={jax.devices()[0].platform} build done", flush=True)
from evcont_tpu.md.integrators import run_nve_stateful

fK, (r1k, r2k), y0 = model.energy_fn_with_store_krylov(
    k=4, small="nocall", init_coords=np.asarray(c))
runk = jax.jit(lambda cc, y, r1, r2: run_nve_stateful(
    lambda x, s: fK(x, s, r1, r2), masses, cc, None, dt, n_md, y))
t0 = time.time()
ep = np.array(runk(c, y0, r1k, r2k)["epot"])
print(f"[k4-nocall] compile+first {time.time() - t0:.1f} s", flush=True)
reps = []
for _ in range(3):
    t0 = time.time()
    ep = np.array(runk(c, y0, r1k, r2k)["epot"])
    reps.append(time.time() - t0)
print(f"[k4-nocall] {n_md / float(np.median(reps)):.1f} steps/s "
      f"(reps {[round(r, 3) for r in reps]})", flush=True)
print(f"[k4-nocall] epot[0]={ep[0]:.8f} epot[-1]={ep[-1]:.8f}", flush=True)
