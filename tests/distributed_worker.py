"""Worker for the 2-process ``jax.distributed`` CPU test (run by
``tests/test_multiprocess.py``; the analogue of the reference CI's
``mpirun -n 2 --oversubscribe pytest --with-mpi`` leg, CI.yml:60-69).

Each process drives 4 virtual CPU devices; the two processes form one
8-device ``data`` mesh.  The worker trains the deterministic synthetic
dataset data-parallel for a few epochs, saves a multi-host orbax
checkpoint, restores it, runs one more epoch, and writes its loss
trajectory to a JSON file.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg():
    """Model config shared by the workers and the in-test baseline."""
    from hydragnn_tpu.models.base import StackConfig, normalize_branches

    return StackConfig(
        input_dim=1,
        hidden_dim=16,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=normalize_branches(
            {
                "num_sharedlayers": 1,
                "dim_sharedlayers": 16,
                "num_headlayers": 2,
                "dim_headlayers": [16, 16],
            }
        ),
        task_weights=(1.0,),
        num_conv_layers=2,
    )


def _build_samples(bs):
    """Deterministic y-packed samples, identical on every process."""
    from hydragnn_tpu.data.pipeline import normalize_minmax, select_variables
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.data.synthetic import deterministic_graph_data

    samples = deterministic_graph_data(number_configurations=8 * bs, seed=7)
    var = {"input_node_features": [0], "output_index": [0], "type": ["graph"]}
    normalize_minmax(samples, [1, 1, 1], [1])
    select_variables(samples, var, [1, 1, 1], [1])
    for s in samples:
        s.edge_index = radius_graph(s.pos, 2.0, 100)
    return samples


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    outdir = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from hydragnn_tpu.parallel.runtime import setup_distributed

    world, rank = setup_distributed(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert world == nproc and rank == pid
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    import numpy as np

    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.dp import DataParallelTrainer, make_mesh
    from hydragnn_tpu.parallel.runtime import shard_samples_for_host
    from hydragnn_tpu.train.checkpoint import CheckpointManager

    bs = 4
    samples = _build_samples(bs)
    dims = compute_batch_dims(samples, bs)  # identical on every process
    local = shard_samples_for_host(samples)
    assert len(local) == 4 * bs
    loader = PaddedBatcher(local, bs, dims=dims)

    model = create_model("GIN", build_cfg())
    mesh = make_mesh(4 * nproc)
    trainer = DataParallelTrainer(
        model, {"type": "AdamW", "learning_rate": 1e-3}, mesh
    )
    example = next(iter(loader))
    state = trainer.init_state(example)
    state = trainer.place_state(state)

    losses = []
    for epoch in range(3):
        loader.set_epoch(epoch)
        state, loss, _ = trainer.run_epoch(state, loader)
        losses.append(float(loss))

    # multi-host orbax checkpoint round trip (every process participates)
    ckpt_dir = os.path.join(outdir, "ckpt")
    mngr = CheckpointManager(ckpt_dir)
    mngr.save(3, state)
    restored = mngr.restore(state)
    restored = trainer.place_state(restored)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(jax.tree.leaves(restored.params)[0])),
        np.asarray(jax.device_get(jax.tree.leaves(state.params)[0])),
    )
    loader.set_epoch(3)
    restored, loss4, _ = trainer.run_epoch(restored, loader)
    losses.append(float(loss4))

    with open(os.path.join(outdir, f"losses_{pid}.json"), "w") as f:
        json.dump(losses, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
