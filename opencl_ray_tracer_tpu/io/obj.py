"""Wavefront OBJ loader.

Same subset as the reference loader (``src/cpp/utility.cpp:63-170``):
``v`` and ``f`` records only, triangulated faces, both the plain ``f a b c``
and the 9-token ``f a/b/c a/b/c a/b/c`` forms, 1-indexed vertices, per-mesh
scale + translate applied to vertices, and an AABB accumulated over the
transformed vertices (``utility.cpp:121-127``).

The reference's two-pass count functions (``GetNumOfVertices`` /
``GetNumOfFaces``, ``utility.cpp:63-97``) exist because it preallocates C
arrays; here a single pass builds numpy arrays directly.  A native C++
fast path (io.native) is used when built; this pure-Python version is the
always-available fallback and the behavioural reference.
"""

from __future__ import annotations

import numpy as np


def parse_obj(text: str, scale=(1.0, 1.0, 1.0), translate=(0.0, 0.0, 0.0)):
    """Parse OBJ text -> ((T,3,3) f32 triangles, (min(3,), max(3,)) AABB)."""
    scale = np.asarray(scale, np.float32)
    translate = np.asarray(translate, np.float32)
    verts = []
    faces = []
    for line in text.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            v = np.array([float(parts[1]), float(parts[2]),
                          float(parts[3])], np.float32)
            verts.append(v * scale + translate)
        elif parts[0] == "f":
            # The reference replaces spaces with '/' and tokenizes
            # (utility.cpp:134-157): 9 tokens -> a/b/c form (vertex index is
            # token 0 of each group); otherwise plain "f a b c".
            toks = "/".join(parts[1:]).split("/")
            if len(toks) == 9:
                idx = (toks[0], toks[3], toks[6])
            else:
                idx = (toks[0], toks[1], toks[2])
            faces.append([int(i) for i in idx])
    verts = (np.stack(verts) if verts
             else np.zeros((0, 3), np.float32))
    if verts.shape[0]:
        aabb_min = verts.min(axis=0)
        aabb_max = verts.max(axis=0)
    else:
        aabb_min = np.zeros(3, np.float32)
        aabb_max = np.zeros(3, np.float32)
    if faces:
        f = np.asarray(faces, np.int64) - 1  # 1-indexed (utility.cpp:160-162)
        tris = verts[f]                      # (T,3,3)
    else:
        tris = np.zeros((0, 3, 3), np.float32)
    return tris.astype(np.float32), (aabb_min, aabb_max)


def load_obj(path: str, scale=(1.0, 1.0, 1.0), translate=(0.0, 0.0, 0.0)):
    """Load an OBJ file; prefers the native C++ parser when available."""
    try:
        from .native import load_obj_native
        out = load_obj_native(path, scale, translate)
        if out is not None:
            return out
    except Exception:
        pass
    with open(path) as f:
        return parse_obj(f.read(), scale, translate)
