"""Multi-host runtime bootstrap and dataset sharding helpers.

The TPU-native replacement for the reference's distributed runtime
(``hydragnn/utils/distributed/distributed.py``):
  * ``setup_distributed`` <- ``setup_ddp`` (:151-275): one call to
    ``jax.distributed.initialize`` replaces the whole backend-select +
    scheduler-specific rendezvous + port-retry machinery (the coordinator
    address comes from the launcher or ``JAX_COORDINATOR_ADDRESS``).
  * ``get_comm_size_and_rank`` (:96-110) -> process_count/index.
  * ``nsplit`` (:584-597): contiguous near-equal splitting, used to shard
    sample lists across hosts.
  * ``shard_samples_for_host``: each host keeps its slice (the
    DistributedSampler/DDStore-partitioning analogue -- the dataset, not
    the file, is what gets sharded).
  * ``print_peak_memory`` (:566-581 analogue) via device memory stats.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple


def setup_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize the multi-host runtime; no-op on a single host.

    Returns (world_size, rank) as process counts (each process drives all
    of its host's chips -- ranks are hosts, not chips, unlike the
    reference's one-rank-per-GPU model).
    """
    import jax

    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count(), jax.process_index()


def ensure_devices(n: int, force_cpu: bool = False) -> None:
    """Guarantee at least ``n`` JAX devices for multi-chip code paths.

    On a real slice this is a no-op (unless ``force_cpu``).  On a
    single-chip or CPU host it rebuilds the backend as an ``n``-device
    virtual CPU mesh.  With ``force_cpu=True`` the backend is rebuilt onto
    CPU unconditionally — the contract of example ``--cpu`` flags — even
    on hosts that already expose >= ``n`` accelerator devices.  In-process
    config is the only reliable switch: PJRT plugins registered from a
    sitecustomize (this environment's single-chip TPU tunnel) take
    precedence over the ``JAX_PLATFORMS`` / ``XLA_FLAGS`` env vars.
    """
    import jax

    backend = jax.default_backend()
    if len(jax.devices()) >= n and not (force_cpu and backend != "cpu"):
        return
    import jax.extend.backend as jexb

    if backend != "cpu":
        # users on partially-equipped slices (e.g. 4 real chips when n=8)
        # must know their accelerators were discarded for a CPU mesh
        import warnings

        warnings.warn(
            f"ensure_devices: replacing '{backend}' backend "
            f"({len(jax.devices())} device(s)) with a {n}-device virtual "
            "CPU mesh",
            stacklevel=2,
        )
    jexb.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    if len(jax.devices()) < n:
        raise RuntimeError(
            f"could not provision {n} virtual devices "
            f"(have {len(jax.devices())})"
        )


def get_comm_size_and_rank() -> Tuple[int, int]:
    import jax

    return jax.process_count(), jax.process_index()


def nsplit(seq: Sequence, n: int) -> List[List]:
    """Split into n contiguous near-equal chunks (reference nsplit
    semantics: sizes differ by at most one, longer chunks first)."""
    seq = list(seq)
    k, m = divmod(len(seq), n)
    out = []
    start = 0
    for i in range(n):
        size = k + (1 if i < m else 0)
        out.append(seq[start : start + size])
        start += size
    return out


def shard_samples_for_host(samples: Sequence, seed: int = 43) -> List:
    """Deterministically shuffle then keep this host's contiguous shard
    (the reference shuffles the filelist with seed 43 before nsplit,
    ``abstractrawdataset.py:166-176``)."""
    import random

    import jax

    idx = list(range(len(samples)))
    random.Random(seed).shuffle(idx)
    chunk = nsplit(idx, jax.process_count())[jax.process_index()]
    return [samples[i] for i in chunk]


def print_peak_memory(tag: str = "") -> Optional[int]:
    """Best-effort device peak-memory report (reference
    ``print_peak_memory``, distributed.py:566-581)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") if stats else None
        if peak is not None:
            print(f"{tag} peak device memory: {peak / 2**30:.3f} GiB")
        return peak
    except Exception:
        return None
