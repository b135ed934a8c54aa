"""Camera projection models and rolling-shutter handling (pure JAX).

Reimplements the reference sensor stack:
- OpenCV pinhole with radial(6)/tangential(2)/thin-prism(4) distortion
  (threedgut_tracer .../sensors/cameraProjections.cuh:72-118),
- OpenCV fisheye with 4 radial theta-poly coefficients (:120-146),
- FTheta polynomial cameras, both polynomial directions with Newton
  inversion (:148-198),
- rolling-shutter projection via pose slerp fixed-point iteration
  (:218-257).

Cameras are pytrees (flax.struct) whose *shapes/enums* are static so a
jitted render specializes per camera model, mirroring the reference's
compile-time camera-model dispatch.
"""

from __future__ import annotations

import enum
from typing import Tuple

import jax.numpy as jnp
from flax import struct

from .quaternion import quat_slerp, quat_to_rotmat

FTHETA_POLY_DEGREE = 6


class ShutterType(enum.IntEnum):
    GLOBAL = 0
    ROLLING_TOP_TO_BOTTOM = 1
    ROLLING_LEFT_TO_RIGHT = 2
    ROLLING_BOTTOM_TO_TOP = 3
    ROLLING_RIGHT_TO_LEFT = 4


class CameraModelType(enum.IntEnum):
    OPENCV_PINHOLE = 0
    OPENCV_FISHEYE = 1
    FTHETA = 2


@struct.dataclass
class CameraModel:
    """Intrinsics + shutter + world->camera poses for one sensor view.

    ``resolution``/``model_type``/``shutter_type``/``ftheta_reference_poly``
    are static (hashable) fields -> jit specializes on them.
    """
    # --- static fields ---
    resolution: Tuple[int, int] = struct.field(pytree_node=False)  # (W, H)
    model_type: int = struct.field(pytree_node=False, default=int(CameraModelType.OPENCV_PINHOLE))
    shutter_type: int = struct.field(pytree_node=False, default=int(ShutterType.GLOBAL))
    # FTheta: which poly is the calibrated reference (0: angle->pixeldist is
    # reference / evaluate directly, 1: pixeldist->angle is reference /
    # Newton-invert).
    ftheta_reference_poly: int = struct.field(pytree_node=False, default=0)

    # --- traced fields ---
    focal: jnp.ndarray = None            # [2] fx, fy
    principal: jnp.ndarray = None        # [2] cx, cy
    radial: jnp.ndarray = None           # [6] pinhole / [4] fisheye (padded to 6)
    tangential: jnp.ndarray = None       # [2]
    thin_prism: jnp.ndarray = None       # [4]
    max_angle: jnp.ndarray = None        # scalar (fisheye / ftheta FOV clamp)
    # FTheta polynomials (padded to FTHETA_POLY_DEGREE)
    ftheta_angle_to_pixeldist: jnp.ndarray = None  # [6]
    ftheta_pixeldist_to_angle: jnp.ndarray = None  # [6]
    ftheta_linear_cde: jnp.ndarray = None          # [3]
    # world->camera pose at shutter start/end: x_cam = R(q) @ x_world + t
    t_start: jnp.ndarray = None          # [3]
    q_start: jnp.ndarray = None          # [4] wxyz
    t_end: jnp.ndarray = None            # [3]
    q_end: jnp.ndarray = None            # [4] wxyz

    @property
    def width(self) -> int:
        return self.resolution[0]

    @property
    def height(self) -> int:
        return self.resolution[1]


def make_pinhole(resolution, focal, principal, radial=None, tangential=None,
                 thin_prism=None, t=None, q=None, t_end=None, q_end=None,
                 shutter_type: int = int(ShutterType.GLOBAL)) -> CameraModel:
    """Convenience constructor for an (optionally distorted) pinhole camera."""
    z3 = jnp.zeros(3, jnp.float32)
    qid = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t = z3 if t is None else jnp.asarray(t, jnp.float32)
    q = qid if q is None else jnp.asarray(q, jnp.float32)
    return CameraModel(
        resolution=tuple(int(v) for v in resolution),
        model_type=int(CameraModelType.OPENCV_PINHOLE),
        shutter_type=int(shutter_type),
        focal=jnp.asarray(focal, jnp.float32),
        principal=jnp.asarray(principal, jnp.float32),
        radial=jnp.zeros(6, jnp.float32) if radial is None else jnp.asarray(radial, jnp.float32),
        tangential=jnp.zeros(2, jnp.float32) if tangential is None else jnp.asarray(tangential, jnp.float32),
        thin_prism=jnp.zeros(4, jnp.float32) if thin_prism is None else jnp.asarray(thin_prism, jnp.float32),
        max_angle=jnp.asarray(jnp.pi, jnp.float32),
        ftheta_angle_to_pixeldist=jnp.zeros(FTHETA_POLY_DEGREE, jnp.float32),
        ftheta_pixeldist_to_angle=jnp.zeros(FTHETA_POLY_DEGREE, jnp.float32),
        ftheta_linear_cde=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        t_start=t, q_start=q,
        t_end=t if t_end is None else jnp.asarray(t_end, jnp.float32),
        q_end=q if q_end is None else jnp.asarray(q_end, jnp.float32),
    )


def make_fisheye(resolution, focal, principal, radial4, max_angle,
                 t=None, q=None, t_end=None, q_end=None,
                 shutter_type: int = int(ShutterType.GLOBAL)) -> CameraModel:
    z3 = jnp.zeros(3, jnp.float32)
    qid = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t = z3 if t is None else jnp.asarray(t, jnp.float32)
    q = qid if q is None else jnp.asarray(q, jnp.float32)
    radial = jnp.zeros(6, jnp.float32).at[:4].set(jnp.asarray(radial4, jnp.float32))
    return CameraModel(
        resolution=tuple(int(v) for v in resolution),
        model_type=int(CameraModelType.OPENCV_FISHEYE),
        shutter_type=int(shutter_type),
        focal=jnp.asarray(focal, jnp.float32),
        principal=jnp.asarray(principal, jnp.float32),
        radial=radial,
        tangential=jnp.zeros(2, jnp.float32),
        thin_prism=jnp.zeros(4, jnp.float32),
        max_angle=jnp.asarray(max_angle, jnp.float32),
        ftheta_angle_to_pixeldist=jnp.zeros(FTHETA_POLY_DEGREE, jnp.float32),
        ftheta_pixeldist_to_angle=jnp.zeros(FTHETA_POLY_DEGREE, jnp.float32),
        ftheta_linear_cde=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        t_start=t, q_start=q,
        t_end=t if t_end is None else jnp.asarray(t_end, jnp.float32),
        q_end=q if q_end is None else jnp.asarray(q_end, jnp.float32),
    )


def make_ftheta(resolution, principal, angle_to_pixeldist, pixeldist_to_angle,
                reference_poly: int, linear_cde, max_angle,
                t=None, q=None, t_end=None, q_end=None,
                shutter_type: int = int(ShutterType.GLOBAL)) -> CameraModel:
    z3 = jnp.zeros(3, jnp.float32)
    qid = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t = z3 if t is None else jnp.asarray(t, jnp.float32)
    q = qid if q is None else jnp.asarray(q, jnp.float32)

    def pad6(c):
        c = jnp.asarray(c, jnp.float32)
        return jnp.zeros(FTHETA_POLY_DEGREE, jnp.float32).at[: c.shape[0]].set(c)

    return CameraModel(
        resolution=tuple(int(v) for v in resolution),
        model_type=int(CameraModelType.FTHETA),
        shutter_type=int(shutter_type),
        ftheta_reference_poly=int(reference_poly),
        focal=jnp.ones(2, jnp.float32),
        principal=jnp.asarray(principal, jnp.float32),
        radial=jnp.zeros(6, jnp.float32),
        tangential=jnp.zeros(2, jnp.float32),
        thin_prism=jnp.zeros(4, jnp.float32),
        max_angle=jnp.asarray(max_angle, jnp.float32),
        ftheta_angle_to_pixeldist=pad6(angle_to_pixeldist),
        ftheta_pixeldist_to_angle=pad6(pixeldist_to_angle),
        ftheta_linear_cde=jnp.asarray(linear_cde, jnp.float32),
        t_start=t, q_start=q,
        t_end=t if t_end is None else jnp.asarray(t_end, jnp.float32),
        q_end=q if q_end is None else jnp.asarray(q_end, jnp.float32),
    )


# ---------------------------------------------------------------------------
# projection of camera-space points
# ---------------------------------------------------------------------------

def _within_resolution(res_wh, tolerance, p):
    tol = jnp.asarray(res_wh, jnp.float32) * tolerance
    return ((p[..., 0] > -tol[0]) & (p[..., 1] > -tol[1])
            & (p[..., 0] < res_wh[0] + tol[0]) & (p[..., 1] < res_wh[1] + tol[1]))


def _horner(coeffs: jnp.ndarray, n: int, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sum_i coeffs[i] x^i for i < n (static n)."""
    y = jnp.full_like(x, coeffs[n - 1])
    for i in range(n - 2, -1, -1):
        y = x * y + coeffs[i]
    return y


def _project_opencv_pinhole(cam: CameraModel, p: jnp.ndarray, tolerance):
    """cameraProjections.cuh:72-118."""
    z = p[..., 2]
    valid_z = z > 0.0
    zs = jnp.where(valid_z, z, 1.0)
    uv = p[..., :2] / zs[..., None]
    uv2 = uv * uv
    r2 = uv2[..., 0] + uv2[..., 1]
    a1 = 2.0 * uv[..., 0] * uv[..., 1]
    a2 = r2 + 2.0 * uv2[..., 0]
    a3 = r2 + 2.0 * uv2[..., 1]
    k = cam.radial
    icd_num = 1.0 + r2 * (k[0] + r2 * (k[1] + r2 * k[2]))
    icd_den = 1.0 + r2 * (k[3] + r2 * (k[4] + r2 * k[5]))
    icd = icd_num / icd_den
    t0, t1 = cam.tangential[0], cam.tangential[1]
    s = cam.thin_prism
    delta = jnp.stack([
        t0 * a1 + t1 * a2 + r2 * (s[0] + r2 * s[1]),
        t0 * a3 + t1 * a1 + r2 * (s[2] + r2 * s[3]),
    ], axis=-1)
    uv_nd = icd[..., None] * uv + delta
    valid_radial = (icd > 0.8) & (icd < 1.2)
    proj_ok = uv_nd * cam.focal + cam.principal
    # out-of-limits: clip direction to an out-of-image radius (cuh:108-115)
    roi_radius = jnp.hypot(float(cam.width), float(cam.height))
    proj_bad = (roi_radius / jnp.sqrt(jnp.maximum(r2, 1e-20)))[..., None] * uv + cam.principal
    proj = jnp.where(valid_radial[..., None], proj_ok, proj_bad)
    valid = valid_z & valid_radial & _within_resolution(cam.resolution, tolerance, proj)
    proj = jnp.where(valid_z[..., None], proj, 0.0)
    return proj, valid


def _stable_norm2(v: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(v[..., 0])
    ay = jnp.abs(v[..., 1])
    mn = jnp.minimum(ax, ay)
    mx = jnp.maximum(ax, ay)
    ratio = mn / jnp.maximum(mx, 1e-30)
    return jnp.where(mx <= 0.0, 0.0, mx * jnp.sqrt(1.0 + ratio * ratio))


def _project_opencv_fisheye(cam: CameraModel, p: jnp.ndarray, tolerance):
    """cameraProjections.cuh:120-146."""
    rho = jnp.maximum(_stable_norm2(p[..., :2]), 1.1754944e-38)
    theta_full = jnp.arctan2(rho, p[..., 2])
    theta = jnp.minimum(theta_full, cam.max_angle)
    theta2 = theta * theta
    poly = _horner(cam.radial, 4, theta2)
    delta = theta * (poly * theta2 + 1.0) / rho
    proj = cam.focal * p[..., :2] * delta[..., None] + cam.principal
    valid = (theta < cam.max_angle) & _within_resolution(cam.resolution, tolerance, proj)
    return proj, valid


def _project_ftheta(cam: CameraModel, p: jnp.ndarray, tolerance):
    """cameraProjections.cuh:148-198 (3 Newton iterations)."""
    rho = jnp.maximum(_stable_norm2(p[..., :2]), 1.1754944e-38)
    theta_full = jnp.arctan2(rho, p[..., 2])
    theta = jnp.minimum(theta_full, cam.max_angle)
    n = FTHETA_POLY_DEGREE
    if cam.ftheta_reference_poly == 1:  # PIXELDIST_TO_ANGLE is reference
        delta = _horner(cam.ftheta_angle_to_pixeldist, n, theta)
        dcoef = jnp.arange(1, n, dtype=jnp.float32) * cam.ftheta_pixeldist_to_angle[1:]
        for _ in range(3):
            dfdx = _horner(dcoef, n - 1, delta)
            residual = _horner(cam.ftheta_pixeldist_to_angle, n, delta) - theta
            delta = delta - residual / dfdx
    else:
        delta = _horner(cam.ftheta_angle_to_pixeldist, n, theta)
    c, d, e = (cam.ftheta_linear_cde[0], cam.ftheta_linear_cde[1],
               cam.ftheta_linear_cde[2])
    scaled = (delta / rho)[..., None]
    proj = scaled * jnp.stack([c * p[..., 0] + d * p[..., 1],
                               e * p[..., 0] + p[..., 1]], axis=-1)
    proj = proj + cam.principal + 0.5
    valid = (theta < cam.max_angle) & _within_resolution(cam.resolution, tolerance, proj)
    return proj, valid


def project_point(cam: CameraModel, p_cam: jnp.ndarray, tolerance=0.0):
    """Project camera-space points -> (pixel uv, valid). Dispatch is static."""
    if cam.model_type == int(CameraModelType.OPENCV_PINHOLE):
        return _project_opencv_pinhole(cam, p_cam, tolerance)
    if cam.model_type == int(CameraModelType.OPENCV_FISHEYE):
        return _project_opencv_fisheye(cam, p_cam, tolerance)
    if cam.model_type == int(CameraModelType.FTHETA):
        return _project_ftheta(cam, p_cam, tolerance)
    raise ValueError(f"unknown camera model {cam.model_type}")


# ---------------------------------------------------------------------------
# rolling shutter
# ---------------------------------------------------------------------------

def relative_shutter_time(cam: CameraModel, uv: jnp.ndarray) -> jnp.ndarray:
    """cameraProjections.cuh:50-65; 0.5 for global shutter."""
    w, h = cam.resolution
    st = cam.shutter_type
    if st == int(ShutterType.ROLLING_TOP_TO_BOTTOM):
        return jnp.floor(uv[..., 1]) / (h - 1.0)
    if st == int(ShutterType.ROLLING_LEFT_TO_RIGHT):
        return jnp.floor(uv[..., 0]) / (w - 1.0)
    if st == int(ShutterType.ROLLING_BOTTOM_TO_TOP):
        return (h - jnp.ceil(uv[..., 1])) / (h - 1.0)
    if st == int(ShutterType.ROLLING_RIGHT_TO_LEFT):
        return (w - jnp.ceil(uv[..., 0])) / (w - 1.0)
    return jnp.full(uv.shape[:-1], 0.5, uv.dtype)


def world_to_camera(cam: CameraModel, p_world: jnp.ndarray, t, q) -> jnp.ndarray:
    rot = quat_to_rotmat(q)
    return jnp.einsum("ij,...j->...i", rot, p_world, precision="highest") + t


def project_point_with_shutter(cam: CameraModel, p_world: jnp.ndarray,
                               tolerance=0.0, n_iterations: int = 5):
    """World point -> pixel with rolling-shutter refinement.

    cameraProjections.cuh:218-257. For a global shutter this is a single
    projection through the start pose.
    """
    proj0, valid0 = project_point(cam, world_to_camera(cam, p_world, cam.t_start, cam.q_start), tolerance)
    if cam.shutter_type == int(ShutterType.GLOBAL):
        return proj0, valid0
    proj_end, valid_end = project_point(cam, world_to_camera(cam, p_world, cam.t_end, cam.q_end), tolerance)
    proj = jnp.where(valid0[..., None], proj0, proj_end)
    # reference early-outs (returns invalid) when BOTH the start- and
    # end-pose projections fail (cameraProjections.cuh:227-232); the
    # branchless equivalent masks the refined validity with the seed one
    seeded = valid0 | valid_end
    valid = seeded
    for _ in range(n_iterations):
        alpha = relative_shutter_time(cam, proj)
        q = quat_slerp(cam.q_start, cam.q_end, alpha[..., None])
        t = cam.t_start * (1.0 - alpha[..., None]) + cam.t_end * alpha[..., None]
        rot = quat_to_rotmat(q)
        p_cam = jnp.einsum("...ij,...j->...i", rot, p_world, precision="highest") + t
        proj_i, valid_i = project_point(cam, p_cam, tolerance)
        proj = proj_i
        valid = valid_i
    return proj, valid & seeded


# ---------------------------------------------------------------------------
# ray generation (camera-space rays, matching dataset conventions)
# ---------------------------------------------------------------------------

def pinhole_camera_rays(width: int, height: int, fx, fy, cx=None, cy=None,
                        jitter=None, dtype=jnp.float32):
    """Camera-space pinhole ray directions at pixel centers.

    Reference: threedgrut/datasets/utils.py:61-87.
    Returns (origins [H,W,3] zeros, normalized dirs [H,W,3]).
    """
    if cx is None:
        cx = 0.5 * width
    if cy is None:
        cy = 0.5 * height
    y, x = jnp.meshgrid(jnp.arange(height, dtype=dtype),
                        jnp.arange(width, dtype=dtype), indexing="ij")
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter[..., 0], jitter[..., 1]
    xs = (x + jx - cx) / fx
    ys = (y + jy - cy) / fy
    dirs = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.zeros_like(dirs), dirs


def fisheye_camera_rays(width: int, height: int, focal, principal, radial4,
                        max_angle, newton_iters: int = 10, dtype=jnp.float32):
    """Camera-space rays for the OpenCV fisheye model (theta-poly inversion).

    Inverts r(theta) = theta * (1 + sum_i k_i theta^(2i+2)) per pixel with
    Newton iterations; matches the projection in cameraProjections.cuh:120.
    """
    y, x = jnp.meshgrid(jnp.arange(height, dtype=dtype) + 0.5,
                        jnp.arange(width, dtype=dtype) + 0.5, indexing="ij")
    u = (x - principal[0]) / focal[0]
    v = (y - principal[1]) / focal[1]
    r = jnp.sqrt(u * u + v * v)
    theta = jnp.clip(r, 0.0, max_angle)
    k = jnp.asarray(radial4, dtype)
    for _ in range(newton_iters):
        t2 = theta * theta
        poly = 1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3])))
        f = theta * poly - r
        dpoly = k[0] + t2 * (2 * k[1] + t2 * (3 * k[2] + t2 * 4 * k[3]))
        df = poly + theta * (2.0 * theta * dpoly)
        theta = theta - f / jnp.maximum(df, 1e-9)
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    scale = jnp.where(r > 1e-9, sin_t / jnp.maximum(r, 1e-9), 1.0)
    dirs = jnp.stack([u * scale, v * scale, cos_t], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.zeros_like(dirs), dirs
