"""Standalone TPU probe for ops/fused_gather.py: compiles + times the raw
fused kernels on the bench batch (run this alone -- one TPU process at a
time through the axon tunnel)."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from bench import build_bench_batch
    from hydragnn_tpu.ops.fused_gather import (
        fused_minmax,
        fused_pna_aggregate,
        gather_segsum,
    )

    print("backend:", jax.default_backend(), flush=True)
    batch = jax.device_put(build_bench_batch())
    print("meta:", batch.agg_meta, "windows:", batch.agg_rcv_lot is not None,
          flush=True)
    rng = np.random.default_rng(0)
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    x = jax.device_put(rng.normal(size=(batch.n_node, F)).astype(np.float32))
    y = jax.device_put(rng.normal(size=(batch.n_node, F)).astype(np.float32))

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        c = jax.jit(fn).lower(*a).compile()
        t1 = time.perf_counter()
        out = c(*a)
        val = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t2 = time.perf_counter()
        n, reps = 0, 5
        t3 = time.perf_counter()
        for _ in range(reps):
            out = c(*a)
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t3) / reps
        print(
            f"{name}: compile {t1-t0:.1f}s first {t2-t1:.2f}s "
            f"steady {dt*1e3:.2f} ms (val {val:.4f})",
            flush=True,
        )

    timeit("gather_segsum fwd", lambda v: gather_segsum(batch, v), x)
    timeit(
        "gather_segsum grad",
        jax.grad(lambda v: jnp.sum(gather_segsum(batch, v) ** 2)),
        x,
    )
    timeit("fused_minmax fwd", lambda a, b: fused_minmax(batch, a, b)[0], x, y)
    timeit(
        "fused_minmax grad",
        jax.grad(
            lambda a: sum(jnp.sum(o) for o in fused_minmax(batch, a, y))
        ),
        x,
    )
    timeit(
        "fused_pna grad",
        jax.grad(
            lambda a: sum(
                jnp.sum(o) for o in fused_pna_aggregate(batch, a, y)
            )
        ),
        x,
    )


if __name__ == "__main__":
    main()
