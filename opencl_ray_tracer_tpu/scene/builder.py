"""JSON scene descriptor.

Implements the reference's own unimplemented to-do item ("Scene descriptor
JSON file", ``README.md:56``).  A scene JSON can describe the camera, sphere
list, OBJ meshes (with the reference's scale+translate transform,
``main.cpp:119-120``), and the sky.

Schema (all fields optional with reference defaults):

{
  "camera": {"look_from": [x,y,z], "look_at": [x,y,z], "vup": [0,1,0],
             "vfov_deg": 60, "aspect_ratio": 1.7777, "focus_dist": 2.0,
             "aperture_deg": 1.2},
  "spheres": [{"center": [..], "radius": r, "albedo": [..], "fuzz": f,
               "ior": i, "material": "lambertian|metal|dielectric|emissive"}],
  "meshes": [{"path": "model.obj", "scale": [..], "translate": [..],
              "albedo": [..], "fuzz": f, "ior": i, "material": "metal"}],
  "sky": {"kind": "gradient"} | {"kind": "hdr", "path": "sky.hdr",
                                  "tonemap": true}
        | {"kind": "const", "colour": [r,g,b]}
}
"""

from __future__ import annotations

import json
import os

import numpy as np

from .camera import Camera
from .geometry import BoundingBoxes, Spheres, Triangles
from .sky import Sky
from . import materials as mat
from . import Scene


def _mat_type(name) -> int:
    if isinstance(name, int):
        return name
    return mat.MATERIAL_NAMES[str(name).lower()]


def scene_from_json(source: str, base_dir: str | None = None) -> "Scene":
    """Build a Scene from a JSON string or file path."""
    if os.path.exists(source):
        base_dir = base_dir or os.path.dirname(os.path.abspath(source))
        with open(source) as f:
            spec = json.load(f)
    else:
        spec = json.loads(source)
        base_dir = base_dir or "."

    cam_spec = spec.get("camera", {})
    camera = Camera.create(
        look_from=cam_spec.get("look_from", (-1.3, 0.2, 0.5)),
        look_at=cam_spec.get("look_at", (0.2, 0.0, -1.5)),
        vup=cam_spec.get("vup", (0.0, 1.0, 0.0)),
        vfov_deg=cam_spec.get("vfov_deg", 60.0),
        aspect_ratio=cam_spec.get("aspect_ratio", 16.0 / 9.0),
        focus_dist=cam_spec.get("focus_dist", 2.0),
        aperture_deg=cam_spec.get("aperture_deg", 1.2),
    )

    entries = []
    for s in spec.get("spheres", []):
        entries.append((tuple(s["center"]), float(s["radius"]),
                        tuple(s.get("albedo", (1.0, 1.0, 1.0))),
                        float(s.get("fuzz", 0.0)), float(s.get("ior", 0.0)),
                        _mat_type(s.get("material", "lambertian"))))
    spheres = Spheres.from_list(entries)

    tris = Triangles.empty()
    boxes = BoundingBoxes.empty()
    mesh_specs = spec.get("meshes", [])
    if mesh_specs:
        from ..io.obj import load_obj
        all_tris = []
        for box_id, m in enumerate(mesh_specs):
            path = os.path.join(base_dir, m["path"])
            verts_tris, aabb = load_obj(
                path, scale=m.get("scale", (1.0, 1.0, 1.0)),
                translate=m.get("translate", (0.0, 0.0, 0.0)))
            all_tris.append(Triangles.from_vertices(
                verts_tris, albedo=m.get("albedo", (0.8, 0.6, 0.2)),
                fuzz=m.get("fuzz", 0.0), ior=m.get("ior", 0.0),
                mat_type=_mat_type(m.get("material", "metal")),
                box_id=box_id))
            if box_id == 0:
                boxes = BoundingBoxes.single(*aabb)
            else:
                import jax.numpy as jnp
                boxes = BoundingBoxes(
                    jnp.concatenate([boxes.box_min,
                                     jnp.asarray(aabb[0], jnp.float32)[None]]),
                    jnp.concatenate([boxes.box_max,
                                     jnp.asarray(aabb[1], jnp.float32)[None]]))
        import jax
        tris = jax.tree.map(lambda *xs: np.concatenate(xs) if xs[0].ndim else xs[0],
                            *all_tris) if len(all_tris) > 1 else all_tris[0]

    sky_spec = spec.get("sky", {"kind": "gradient"})
    kind = sky_spec.get("kind", "gradient")
    if kind == "gradient":
        sky = Sky.gradient()
    elif kind == "const":
        sky = Sky.constant(sky_spec.get("colour", (1.0, 1.0, 1.0)))
    elif kind == "hdr":
        from ..io.hdr import load_hdr, tone_map
        img = load_hdr(os.path.join(base_dir, sky_spec["path"]))
        if sky_spec.get("tonemap", True):
            img = tone_map(img)
        sky = Sky.hdr(img)
    else:
        raise ValueError(f"unknown sky kind: {kind}")

    return Scene(camera, spheres, tris, boxes, sky)


def scene_to_json(scene: "Scene") -> str:
    """Serialize the sphere/camera part of a Scene to the JSON schema.

    (Meshes/HDR are file-backed and not round-tripped; sphere scenes — the
    benchmark scenes — round-trip exactly.)
    """
    cam = scene.camera
    spec = {
        "camera": {
            "look_from": np.asarray(cam.look_from).tolist(),
            "look_at": np.asarray(cam.look_at).tolist(),
            "vup": np.asarray(cam.vup).tolist(),
            "vfov_deg": float(cam.vfov_deg),
            "aspect_ratio": float(cam.aspect_ratio),
            "focus_dist": float(cam.focus_dist),
            "aperture_deg": float(cam.aperture_deg),
        },
        "spheres": [
            {
                "center": np.asarray(scene.spheres.center[i]).tolist(),
                "radius": float(scene.spheres.radius[i]),
                "albedo": np.asarray(scene.spheres.albedo[i]).tolist(),
                "fuzz": float(scene.spheres.fuzz[i]),
                "ior": float(scene.spheres.ior[i]),
                "material": int(scene.spheres.mat_type[i]),
            }
            for i in range(scene.spheres.count)
        ],
        "sky": {"kind": ["gradient", "hdr", "const"][scene.sky.kind]},
    }
    return json.dumps(spec, indent=2)
