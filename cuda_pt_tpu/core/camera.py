"""Perspective / orthographic / thin-lens camera.

Parity with the reference DeviceCamera (src/core/camera_model.cuh:40-119,
src/impl/camera_model.cu:79-153): lookat pose, horizontal fov, optional
horizontal flip, pixel jitter, thin-lens depth of field (aperture + focal
distance), orthographic mode when focal_distance == 0 with aperture < 0
sentinel unused. Also provides the inverse projection used by the light
tracer's camera connection (reference get_splat_pixel,
src/core/camera_model.cuh:92-104).

TPU-native differences: the camera is a flax.struct pytree of arrays, ray
generation is batched over all pixels at once, and WASD-style interactive
moves are plain pure functions returning a new camera.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from . import math as vm
from . import rng as prng
from . import sampling


@flax.struct.dataclass
class Camera:
    # Rotation: columns are (right, up, forward) in world space.
    R: jnp.ndarray  # (3, 3) float32
    t: jnp.ndarray  # (3,)   float32 — position
    focal: jnp.ndarray  # ()  float32 — focal length in pixels
    aperture: jnp.ndarray  # () float32 — lens radius (world units); 0 = pinhole
    focal_dist: jnp.ndarray  # () float32 — focus plane distance; 0 = orthographic
    hsign: jnp.ndarray  # () float32 — -1 when hflip else +1
    width: int = flax.struct.field(pytree_node=False, default=512)
    height: int = flax.struct.field(pytree_node=False, default=512)


def _lookat(origin, target, up):
    origin = np.asarray(origin, np.float64)
    forward = np.asarray(target, np.float64) - origin
    forward = forward / np.linalg.norm(forward)
    up = np.asarray(up, np.float64)
    right = np.cross(up, forward)
    right = right / np.linalg.norm(right)
    true_up = np.cross(forward, right)
    R = np.stack([right, true_up, forward], axis=1)  # columns
    return R.astype(np.float32), origin.astype(np.float32)


def make_camera(
    origin,
    target,
    up=(0.0, 1.0, 0.0),
    fov=40.0,
    width=512,
    height=512,
    hflip=False,
    aperture=0.0,
    focal_dist=-1.0,
) -> Camera:
    """Build a camera from Mitsuba-style lookat + horizontal fov (degrees).

    focal_dist semantics follow the reference: < 0 → pinhole perspective,
    0 → orthographic, > 0 → thin lens focused at that distance.
    """
    R, t = _lookat(origin, target, up)
    focal_px = 0.5 * float(width) / np.tan(0.5 * np.deg2rad(float(fov)))
    return Camera(
        R=jnp.asarray(R),
        t=jnp.asarray(t),
        focal=jnp.float32(focal_px),
        aperture=jnp.float32(max(float(aperture), 0.0)),
        focal_dist=jnp.float32(focal_dist),
        hsign=jnp.float32(-1.0 if hflip else 1.0),
        width=int(width),
        height=int(height),
    )


def generate_rays(cam: Camera, pixel_idx: jnp.ndarray, rng_state: jnp.ndarray):
    """Generate one jittered primary ray per entry of pixel_idx.

    pixel_idx: (B,) int32 flat pixel ids (row-major y * width + x).
    Returns (ray_o (B,3), ray_d (B,3), new_rng_state).
    """
    px = (pixel_idx % cam.width).astype(jnp.float32)
    py = (pixel_idx // cam.width).astype(jnp.float32)
    u, rng_state = prng.next2d(rng_state)
    x = cam.hsign * (px + u[..., 0] - 0.5 * cam.width)
    y = 0.5 * cam.height - (py + u[..., 1])  # image y grows downward
    d_cam = jnp.stack([x, y, jnp.broadcast_to(cam.focal, x.shape)], axis=-1)

    is_ortho = cam.focal_dist == 0.0
    # Perspective direction in world space.
    d_world = vm.normalize(d_cam @ cam.R.T)
    o_world = jnp.broadcast_to(cam.t, d_world.shape)

    # Orthographic: parallel forward rays, origins spread on the image plane
    # (1 world unit per focal-length pixels, matching the perspective frustum
    # at unit distance).
    ortho_off = jnp.stack([x / cam.focal, y / cam.focal, jnp.zeros_like(x)], axis=-1)
    o_ortho = cam.t + ortho_off @ cam.R.T
    d_ortho = jnp.broadcast_to(cam.R[:, 2], d_world.shape)

    o = jnp.where(is_ortho, o_ortho, o_world)
    d = jnp.where(is_ortho, d_ortho, d_world)

    # Thin-lens DoF (reference: src/core/camera_model.cuh:70-87).
    use_lens = (cam.aperture > 0.0) & (cam.focal_dist > 0.0)
    u2, rng_state = prng.next2d(rng_state)
    lens_uv = sampling.concentric_disk(u2) * cam.aperture
    # Focus point along the *unnormalized* camera ray at depth focal_dist.
    z = jnp.maximum(d_cam[..., 2:3], 1e-6)
    p_focus_cam = d_cam * (cam.focal_dist / z)
    lens_cam = jnp.concatenate([lens_uv, jnp.zeros_like(lens_uv[..., :1])], axis=-1)
    o_lens = cam.t + lens_cam @ cam.R.T
    d_lens = vm.normalize((p_focus_cam - lens_cam) @ cam.R.T)
    o = jnp.where(use_lens, o_lens, o)
    d = jnp.where(use_lens, d_lens, d)
    return o, d, rng_state


def splat_pixel(cam: Camera, p: jnp.ndarray):
    """Inverse-project world points to pixel coords (light-tracer connection).

    Returns (px, py, valid) where valid means in front of the camera and
    inside the film. Reference: get_splat_pixel, src/core/camera_model.cuh:92-104.
    """
    rel = p - cam.t
    cam_p = rel @ cam.R  # R^T @ rel since columns are the basis
    z = cam_p[..., 2]
    valid = z > 1e-5
    inv_z = 1.0 / jnp.maximum(z, 1e-5)
    x = cam_p[..., 0] * cam.focal * inv_z * cam.hsign
    y = cam_p[..., 1] * cam.focal * inv_z
    px = x + 0.5 * cam.width
    py = 0.5 * cam.height - y
    valid = (
        valid
        & (px >= 0.0)
        & (px < cam.width)
        & (py >= 0.0)
        & (py < cam.height)
    )
    return px, py, valid


def move(cam: Camera, delta_local) -> Camera:
    """Translate in camera frame (x right, y up, z forward) — viewer WASD."""
    delta = jnp.asarray(delta_local, jnp.float32) @ cam.R.T
    return cam.replace(t=cam.t + delta)


def rotate(cam: Camera, yaw: float, pitch: float) -> Camera:
    """Yaw about world up then pitch about camera right (viewer mouse drag)."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], jnp.float32)
    right = cam.R[:, 0]
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    K = jnp.array(
        [
            [0.0, -right[2], right[1]],
            [right[2], 0.0, -right[0]],
            [-right[1], right[0], 0.0],
        ],
        jnp.float32,
    )
    Rp = jnp.eye(3, dtype=jnp.float32) + sp * K + (1.0 - cp) * (K @ K)
    return cam.replace(R=Rp @ Ry @ cam.R)
