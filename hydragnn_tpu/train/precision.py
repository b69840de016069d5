"""Precision control (reference ``train_validate_test.py:43-109``
``PRECISION_MAP`` / ``resolve_precision``): fp32, fp64, and bf16 (fp32
params + bf16 compute, the autocast analogue).

On TPU, bf16 compute is the native fast path: the train step casts batch
float inputs to bf16 and flax modules compute in the promoted dtype; loss
reductions stay fp32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

PRECISION_MAP = {
    "fp32": (jnp.float32, jnp.float32),
    "bf16": (jnp.float32, jnp.bfloat16),  # params fp32, compute bf16
    "fp64": (jnp.float64, jnp.float64),
}


def resolve_precision(precision: str) -> Tuple[str, jnp.dtype, jnp.dtype]:
    """Returns (name, param_dtype, compute_dtype)."""
    p = (precision or "fp32").lower()
    if p not in PRECISION_MAP:
        raise ValueError(f"Unknown precision {precision}; use fp32|bf16|fp64")
    if p == "fp64":
        jax.config.update("jax_enable_x64", True)
    param_dtype, compute_dtype = PRECISION_MAP[p]
    return p, param_dtype, compute_dtype


def cast_batch_floats(batch, dtype):
    """Cast floating leaves of a GraphBatch to the compute dtype (the h2d
    dtype-cast analogue of ``move_batch_to_device``,
    ``train_validate_test.py:74-84``)."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(_cast, batch)
