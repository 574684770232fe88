"""Material model.

The reference's ``Material`` struct (``cl_material.hpp:6-13`` /
``gpu_kernel.cl:15-21``) carries albedo, fuzz, ior and an integer type
dispatched in ``RayColour``'s switch (``gpu_kernel.cl:282-330``).  Here
materials are *columns of SoA arrays* attached to each primitive batch —
they are the differentiable parameters of inverse rendering.
"""

from __future__ import annotations

LAMBERTIAN = 0   # gpu_kernel.cl:398-413
METAL = 1        # gpu_kernel.cl:415-423
DIELECTRIC = 2   # gpu_kernel.cl:425-451
EMISSIVE = 3     # gpu_kernel.cl:326-329

MATERIAL_NAMES = {
    "lambertian": LAMBERTIAN,
    "metal": METAL,
    "dielectric": DIELECTRIC,
    "glass": DIELECTRIC,
    "emissive": EMISSIVE,
    "light": EMISSIVE,
}
