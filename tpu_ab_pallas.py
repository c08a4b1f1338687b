"""Real-TPU A/B: XLA einsum vs Pallas blocked kernel for the packed
two-body assembly at the Zundel flagship scale (3,570 x 307,720 f32 store,
~4.4 GB — the HBM-streaming hot op of the inference path).

Times, per backend:
  * matvec (B=1, the per-MD-step shape)
  * matmat (B=32, the batched-PES shape)
fwd only; both read the full store from HBM once per call, so the metric
is effective bandwidth. Run on the real chip (not under
JAX_PLATFORMS=cpu); prints a table and the winner. The model-level switch
is ContinuationModel(assembly_backend=...).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from evcont_tpu.subspace.pallas_assembly import (
        pallas_assembly_matvec, pallas_assembly_matmat)
    from bench import make_store_device, NTRAIN

    nao = 28   # Zundel 6-31G
    _, r1, r2 = make_store_device(nao)
    P, K = r2.shape
    gib = P * K * 4 / 2 ** 30
    print(f"store {P}x{K} ({gib:.2f} GiB f32) on "
          f"{jax.devices()[0].platform}", file=sys.stderr)

    key = jax.random.PRNGKey(1)
    x1 = jax.random.normal(key, (K,), dtype=jnp.float32)
    xB = jax.random.normal(key, (K, 32), dtype=jnp.float32)

    cases = {
        "xla_matvec": jax.jit(lambda a, x: a @ x),
        "pallas_matvec": jax.jit(
            lambda a, x: pallas_assembly_matvec(a, x)),
        "xla_matmat": jax.jit(lambda a, x: a @ x),
        "pallas_matmat": jax.jit(
            lambda a, x: pallas_assembly_matmat(a, x)),
    }
    results = {}
    for name, fn in cases.items():
        x = x1 if "matvec" in name else xB
        try:
            out = fn(r2, x)
            np.array(out[:4])            # compile + sync
            times = []
            for _ in range(5):
                t0 = time.time()
                np.array(fn(r2, x)[:4])  # host fetch = sync (axon)
                times.append(time.time() - t0)
            dt = float(np.median(times))
            results[name] = dt
            print(f"{name:>16}: {dt * 1e3:8.2f} ms  "
                  f"({gib / dt:6.1f} GiB/s effective)", file=sys.stderr)
        except Exception as e:
            print(f"{name:>16}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)

    for mode in ("matvec", "matmat"):
        a, b = results.get(f"xla_{mode}"), results.get(f"pallas_{mode}")
        if a and b:
            win = "pallas" if b < a else "xla"
            print(f"{mode}: winner {win} ({min(a,b)/max(a,b):.2f}x of "
                  "loser's time)", file=sys.stderr)


if __name__ == "__main__":
    main()
