"""Weak-scaling harness: data-parallel train step on 1..N devices with a
fixed per-device batch, reporting edges/s and scaling efficiency (the
analogue of the reference's SC25 weak-scaling scripts,
``run-scripts/SC25-job-weak.sh``).

Run on a virtual mesh:
  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py
"""

import json
import time

import numpy as np


def main(device_counts=(1, 2, 4, 8), steps=8):
    import jax

    from bench import build_bench_batch
    from hydragnn_tpu.data.batching import collate
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        shard_stacked_batch,
        stack_batches,
    )
    from hydragnn_tpu.train.loop import Trainer

    navail = len(jax.devices())
    device_counts = [d for d in device_counts if d <= navail]
    hidden = 64
    heads = {
        "num_sharedlayers": 1,
        "dim_sharedlayers": hidden,
        "num_headlayers": 1,
        "dim_headlayers": [hidden],
    }
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=hidden,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=normalize_branches(heads),
        task_weights=(1.0,),
        num_conv_layers=4,
    )
    model = create_model("GIN", cfg)
    trainer = Trainer(model, {"type": "AdamW", "learning_rate": 1e-3})

    batch = build_bench_batch(n_graphs=8, nodes_per_graph=128, avg_degree=16)
    edges_per_device = int(np.asarray(batch.edge_mask).sum())

    results = {}
    for nd in device_counts:
        mesh = make_mesh(nd)
        step = make_dp_train_step(model, trainer.tx, mesh)
        state = trainer.init_state(batch)
        stacked = shard_stacked_batch(stack_batches([batch] * nd), mesh)
        state, loss, _ = step(state, stacked)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss, _ = step(state, stacked)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / steps
        eps = edges_per_device * nd / dt
        results[nd] = eps
        base = results[device_counts[0]] * nd / device_counts[0]
        print(
            json.dumps(
                {
                    "devices": nd,
                    "edges_per_s": round(eps, 1),
                    "weak_scaling_efficiency": round(eps / base, 4),
                }
            )
        )
    return results


if __name__ == "__main__":
    main()
