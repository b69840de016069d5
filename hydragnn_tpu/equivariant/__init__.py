from hydragnn_tpu.equivariant.core import (
    Irreps,
    IrrepsArray,
    LinearIrreps,
    real_spherical_harmonics,
    clebsch_gordan,
    tp_instructions,
)

__all__ = [
    "Irreps",
    "IrrepsArray",
    "LinearIrreps",
    "real_spherical_harmonics",
    "clebsch_gordan",
    "tp_instructions",
]
