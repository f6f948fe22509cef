"""Wavelength → RGB conversion for the dispersion BSDF.

The reference carries 471/531-entry CIE-XYZ + D65 tables in 1D textures
(src/impl/xyz.cu, src/core/xyz.cuh:27-87). On TPU we use the multi-lobe
Gaussian analytic fit of the CIE 1931 color matching functions (Wyman, Sloan
& Shirley, JCGT 2013 — public formulas) evaluated inline on the VPU: no
table gathers in the hot loop, fully differentiable in wavelength.

Wavelengths are sampled uniformly in [WL_MIN, WL_MAX] nm (reference
src/bsdf/dispersion.cuh:61-68 uses 360-830). RGB weights are normalized so a
uniform wavelength average reproduces (1,1,1) — keeping white-furnace tests
exact for dispersive materials.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

WL_MIN = 360.0
WL_MAX = 830.0


def _gauss(x, alpha, mu, s1, s2):
    s = jnp.where(x < mu, s1, s2)
    t = (x - mu) / s
    return alpha * jnp.exp(-0.5 * t * t)


def xyz_fit(wl: jnp.ndarray):
    """CIE 1931 xbar/ybar/zbar at wavelength wl (nm)."""
    x = (
        _gauss(wl, 1.056, 599.8, 37.9, 31.0)
        + _gauss(wl, 0.362, 442.0, 16.0, 26.7)
        + _gauss(wl, -0.065, 501.1, 20.4, 26.2)
    )
    y = _gauss(wl, 0.821, 568.8, 46.9, 40.5) + _gauss(wl, 0.286, 530.9, 16.3, 31.1)
    z = _gauss(wl, 1.217, 437.0, 11.8, 36.0) + _gauss(wl, 0.681, 459.0, 26.0, 13.8)
    return x, y, z


# Kept as PLAIN numpy (not jnp): this module may be first-imported from
# inside a jit trace (megakernel's lazy dispersion import), where a
# module-level jnp.array would be staged into the trace as a tracer.
_XYZ_TO_SRGB = np.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    np.float32,
)


def _compute_norm() -> np.ndarray:
    """Per-channel normalization: mean RGB over uniform wavelengths -> 1.

    Runs at module import. The megakernel imports this module lazily from
    inside a jit trace, so without ensure_compile_time_eval the jnp ops in
    xyz_fit would be staged into the enclosing trace and np.asarray would
    raise TracerArrayConversionError (ADVICE r4 / EXP_DISSECT_BIG kitchen
    row).
    """
    import jax

    wl = np.linspace(WL_MIN, WL_MAX, 2048)
    with jax.ensure_compile_time_eval():
        x, y, z = (np.asarray(v) for v in xyz_fit(jnp.asarray(wl, jnp.float32)))
    xyz = np.stack([x, y, z], axis=-1).mean(axis=0)
    m = np.array(
        [
            [3.2404542, -1.5371385, -0.4985314],
            [-0.9692660, 1.8760108, 0.0415560],
            [0.0556434, -0.2040259, 1.0572252],
        ]
    )
    rgb_mean = m @ xyz
    return (1.0 / np.maximum(rgb_mean, 1e-6)).astype(np.float32)


_NORM = _compute_norm()  # plain numpy, see _XYZ_TO_SRGB note


def wavelength_to_rgb(wl: jnp.ndarray) -> jnp.ndarray:
    """RGB weight of a uniformly-sampled wavelength (mean-one normalized).

    Negative sRGB components are kept (wide-gamut residue) so the estimator
    stays unbiased; the film clips at export.
    """
    x, y, z = xyz_fit(wl)
    xyz = jnp.stack([x, y, z], axis=-1)
    rgb = xyz @ _XYZ_TO_SRGB.T
    return rgb * _NORM
