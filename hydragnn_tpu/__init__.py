"""HydraGNN-TPU: a TPU-native (JAX/XLA/Pallas/pjit) multi-task graph neural
network framework with the capabilities of ORNL/HydraGNN.

This is a from-scratch, TPU-first design -- NOT a port of the reference
(torch/PyG) implementation.  The public API mirrors the reference surface
(`hydragnn/__init__.py:1-3` re-exports `run_training` / `run_prediction`) so
that reference JSON configs run unmodified.

Architecture (see SURVEY.md section 7):
  - ``graphs``    : immutable, statically-shaped padded batched-graph pytree
  - ``ops``       : segment/scatter primitives (XLA fallback + Pallas kernels)
  - ``models``    : conv stacks (GIN/GAT/PNA/.../MACE) on a shared multi-head
                    scaffold, built with flax.linen
  - ``data``      : datasets, radius graphs (incl. PBC), padded bucketing
  - ``train``     : config-driven train/validate/test loop (optax, orbax)
  - ``parallel``  : mesh/sharding utilities (data/branch axes, halo exchange)
"""

from hydragnn_tpu.api import run_training, run_prediction

__version__ = "0.1.0"

__all__ = ["run_training", "run_prediction", "__version__"]
