"""Camera math vs a straight-line scalar re-derivation of
CalculateCamera (cl_camera.cpp:3-44) and GetRay (gpu_kernel.cl:559-578)."""

import math

import jax.numpy as jnp
import numpy as np

from opencl_ray_tracer_tpu.scene import Camera, camera_frame, make_rays


def scalar_calculate_camera(look_from, look_at, vup, vfov, aspect,
                            focus_dist, aperture_deg):
    """Literal scalar transcription of the reference formulas."""
    pi = 3.141592654
    aperture = aperture_deg * pi / 180.0
    theta = vfov * pi / 180.0
    h = math.tan(theta / 2)
    vh = 2.0 * h * focus_dist
    vw = aspect * vh
    lf, la, up = map(np.asarray, (look_from, look_at, vup))
    w = lf - la
    w = w / np.linalg.norm(w)
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    horizontal = u * vw
    vertical = v * vh
    llc = lf - horizontal / 2 - vertical / 2 - w * focus_dist
    dr = focus_dist * math.tan(aperture / 2)
    return dict(origin=lf, horizontal=horizontal, vertical=vertical,
                lower_left_corner=llc, defocus_disc_u=u * dr,
                defocus_disc_v=v * dr, aperture_rad=aperture)


def test_camera_frame_matches_reference_math():
    # The main.cpp:82-91 camera.
    cam = Camera.create(look_from=(-1.3, 0.2, 0.5), look_at=(0.2, 0.0, -1.5),
                        vfov_deg=60.0, aspect_ratio=16.0 / 9.0,
                        focus_dist=2.0, aperture_deg=1.2)
    got = camera_frame(cam)
    want = scalar_calculate_camera((-1.3, 0.2, 0.5), (0.2, 0.0, -1.5),
                                   (0, 1, 0), 60.0, 16.0 / 9.0, 2.0, 1.2)
    for k in ("origin", "horizontal", "vertical", "lower_left_corner",
              "defocus_disc_u", "defocus_disc_v"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
    assert abs(float(got["aperture_rad"]) - want["aperture_rad"]) < 1e-7


def test_pinhole_ray_through_center():
    # aperture = 0 -> ray origin is exactly the camera origin; u=v=0.5 goes
    # through the viewport center = -w direction.
    cam = Camera.create(look_from=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, -1.0),
                        vfov_deg=90.0, aspect_ratio=1.0, focus_dist=1.0,
                        aperture_deg=0.0)
    uu = jnp.array([0.5])
    vv = jnp.array([0.5])
    o, d = make_rays(cam, uu, vv, jnp.array([0.3]), jnp.array([0.7]))
    np.testing.assert_allclose(np.asarray(o[0]), [0, 0, 0], atol=1e-7)
    dn = np.asarray(d[0] / jnp.linalg.norm(d[0]))
    np.testing.assert_allclose(dn, [0, 0, -1], atol=1e-6)


def test_corner_rays_span_fov():
    # 90 deg vfov, aspect 1, focus 1: corners of the viewport at +-1.
    cam = Camera.create(look_from=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, -1.0),
                        vfov_deg=90.0, aspect_ratio=1.0, focus_dist=1.0,
                        aperture_deg=0.0)
    o, d = make_rays(cam, jnp.array([0.0, 1.0]), jnp.array([0.0, 1.0]),
                     jnp.zeros(2), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(d[0]), [-1, -1, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d[1]), [1, 1, -1], atol=1e-5)


def test_defocus_disc_origin_jitter():
    cam = Camera.create(look_from=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, -1.0),
                        vfov_deg=90.0, aspect_ratio=1.0, focus_dist=2.0,
                        aperture_deg=20.0)
    n = 512
    u1 = jnp.linspace(0.01, 0.99, n)
    u2 = jnp.linspace(0.0, 0.999, n)
    o, _ = make_rays(cam, jnp.full(n, 0.5), jnp.full(n, 0.5), u1, u2)
    radius = 2.0 * math.tan(20.0 * 3.141592654 / 180.0 / 2.0)
    dist = np.linalg.norm(np.asarray(o), axis=1)
    assert dist.max() <= radius + 1e-5
    assert dist.max() > 0.5 * radius  # actually spreads over the disc
    assert np.abs(np.asarray(o)[:, 2]).max() < 1e-6  # disc is in (u,v) plane
