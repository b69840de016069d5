"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths run on one host (the analogue of the reference CI's
``mpirun -n 2 pytest --with-mpi``, CI.yml:60-69).

Set ``HYDRAGNN_TPU_TEST_BACKEND=tpu`` to instead run on the real chip
(enables the ``test_pallas_tpu.py`` kernel tests; everything else still
passes but is slow through the tunnel — prefer ``-k pallas``).  TPU runs
MUST disable the default xdist parallelism (``-n 0``): the chip is
single-tenant and concurrent workers wedge the tunnel.

NOTE: this environment ships an 'axon' TPU PJRT plugin registered from a
sitecustomize for EVERY python process; env vars (`JAX_PLATFORMS`,
`JAX_PLATFORM_NAME`) do NOT override it any more -- only
``jax.config.update('jax_platforms', 'cpu')`` before first backend use
works.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("HYDRAGNN_TPU_TEST_BACKEND", "cpu") != "tpu":
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", "axon plugin override failed"
