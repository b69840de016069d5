"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths run on one host (the analogue of the reference CI's
``mpirun -n 2 pytest --with-mpi``, CI.yml:60-69).

NOTE: this environment ships an 'axon' TPU plugin that overrides
``JAX_PLATFORMS``; ``JAX_PLATFORM_NAME`` is the override that works.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
