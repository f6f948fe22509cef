"""Independent-oracle test: a self-contained vectorized NumPy path tracer
(naive cosine-sampled, no NEE/MIS/RR, independent RNG, no shared code with
the framework) must agree with the JAX integrator on the cornell box.

This is the "image allclose vs reference integrator" BASELINE check: the two
implementations share nothing but the scene arrays, so agreement pins the
radiometry (emitter pdf conventions, cosine factors, energy).

Path-length accounting: the JAX integrator at max_depth=N gathers light over
path segments 1..N+1 (NEE adds one segment); the naive oracle at depth D
gathers segments 1..D. So jax(N) is compared against oracle(N+1).
"""

import numpy as np

from cuda_pt_tpu.core.config import MaxDepthParams
from cuda_pt_tpu.models import path_tracer as pt
from cuda_pt_tpu.scene import testscenes


def _oracle_mean(scene_np, cam_np, w, h, n_paths, depth, rng):
    """Vectorized naive PT: mean radiance over uniformly random pixels."""
    p0, e1, e2 = scene_np["p0"], scene_np["e1"], scene_np["e2"]
    albedo, emission = scene_np["albedo"], scene_np["emission"]
    P = n_paths

    px = rng.uniform(0, w, P)
    py = rng.uniform(0, h, P)
    d_cam = np.stack([px - 0.5 * w, 0.5 * h - py, np.full(P, cam_np["focal"])], -1)
    d = d_cam @ cam_np["R"].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam_np["t"], (P, 3)).copy()
    thp = np.ones((P, 3))
    L = np.zeros((P, 3))
    alive = np.ones(P, bool)

    for _ in range(depth):
        # intersect all prims: (P, N)
        h_ = np.cross(d[:, None, :], e2[None])
        a = np.einsum("nj,pnj->pn", e1, h_)
        f = 1.0 / np.where(np.abs(a) < 1e-12, 1e-12, a)
        s = o[:, None, :] - p0[None]
        u = f * np.einsum("pnj,pnj->pn", s, h_)
        q = np.cross(s, e1[None])
        v = f * np.einsum("pj,pnj->pn", d, q)
        t = f * np.einsum("nj,pnj->pn", e2, q)
        ok = (np.abs(a) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
        t = np.where(ok, t, np.inf)
        k = np.argmin(t, axis=1)
        tk = t[np.arange(P), k]
        hit = np.isfinite(tk) & alive
        alive = hit
        if not alive.any():
            break
        kh = np.where(hit, k, 0)
        L += np.where(hit[:, None], thp * emission[kh], 0.0)
        n = np.cross(e1[kh], e2[kh])
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        flip = np.einsum("pj,pj->p", n, d) > 0
        n = np.where(flip[:, None], -n, n)
        thp = np.where(hit[:, None], thp * albedo[kh], thp)
        hit_p = o + np.where(hit, tk, 0.0)[:, None] * d
        # cosine sampling
        u1 = rng.uniform(size=P)
        u2 = rng.uniform(size=P)
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        local = np.stack([r * np.cos(phi), r * np.sin(phi), np.sqrt(np.maximum(1 - u1, 0))], -1)
        up = np.where(
            (np.abs(n[:, 2]) > 0.9)[:, None], np.array([1.0, 0, 0]), np.array([0, 0, 1.0])
        )
        tx = np.cross(up, n)
        tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
        ty = np.cross(n, tx)
        d = local[:, 0:1] * tx + local[:, 1:2] * ty + local[:, 2:3] * n
        o = hit_p + n * 1e-3
    return L.mean(axis=0)


def test_oracle_mean_matches_jax_integrator():
    scene, cam, _ = testscenes.cornell_box(width=24, height=24)
    p0 = np.asarray(scene.geom.p0)
    e1 = np.asarray(scene.geom.e1)
    e2 = np.asarray(scene.geom.e2)
    obj = np.asarray(scene.geom.obj_idx)
    kd = np.asarray(scene.bsdfs.k_d)[np.asarray(scene.objects.bsdf_id)[obj]]
    eid = np.asarray(scene.objects.emitter_id)[obj]
    em = np.asarray(scene.emitters.emission) * np.asarray(scene.emitters.scaler)[:, None]
    emission = np.where((eid > 0)[:, None], em[np.maximum(eid, 0)], 0.0)
    scene_np = {"p0": p0, "e1": e1, "e2": e2, "albedo": kd, "emission": emission}
    cam_np = {"R": np.asarray(cam.R), "t": np.asarray(cam.t), "focal": float(cam.focal)}

    md = MaxDepthParams(max_depth=3, max_diffuse=3)
    img = np.asarray(pt.render(scene, cam, md, spp=128, seed=31, use_bvh=True))
    jax_mean = img.mean(axis=(0, 1))

    rng = np.random.default_rng(123)
    oracle_mean = np.zeros(3)
    reps = 4
    for _ in range(reps):
        oracle_mean += _oracle_mean(scene_np, cam_np, 24, 24, 200_000, 4, rng)
    oracle_mean /= reps

    rel = np.abs(jax_mean - oracle_mean) / np.maximum(oracle_mean, 1e-3)
    assert rel.max() < 0.06, (jax_mean, oracle_mean, rel)


def _oracle_mean_mirror(scene_np, cam_np, w, h, n_paths, depth, rng):
    """Naive PT with two material kinds: diffuse (cosine) and perfect mirror."""
    p0, e1, e2 = scene_np["p0"], scene_np["e1"], scene_np["e2"]
    albedo, emission = scene_np["albedo"], scene_np["emission"]
    is_mirror = scene_np["is_mirror"]
    P = n_paths

    px = rng.uniform(0, w, P)
    py = rng.uniform(0, h, P)
    d_cam = np.stack([px - 0.5 * w, 0.5 * h - py, np.full(P, cam_np["focal"])], -1)
    d = d_cam @ cam_np["R"].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam_np["t"], (P, 3)).copy()
    thp = np.ones((P, 3))
    L = np.zeros((P, 3))
    alive = np.ones(P, bool)

    for _ in range(depth):
        h_ = np.cross(d[:, None, :], e2[None])
        a = np.einsum("nj,pnj->pn", e1, h_)
        f = 1.0 / np.where(np.abs(a) < 1e-12, 1e-12, a)
        s = o[:, None, :] - p0[None]
        u = f * np.einsum("pnj,pnj->pn", s, h_)
        q = np.cross(s, e1[None])
        v = f * np.einsum("pj,pnj->pn", d, q)
        t = f * np.einsum("nj,pnj->pn", e2, q)
        ok = (np.abs(a) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
        t = np.where(ok, t, np.inf)
        k = np.argmin(t, axis=1)
        tk = t[np.arange(P), k]
        hit = np.isfinite(tk) & alive
        alive = hit
        if not alive.any():
            break
        kh = np.where(hit, k, 0)
        L += np.where(hit[:, None], thp * emission[kh], 0.0)
        n = np.cross(e1[kh], e2[kh])
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        flip = np.einsum("pj,pj->p", n, d) > 0
        n = np.where(flip[:, None], -n, n)
        thp = np.where(hit[:, None], thp * albedo[kh], thp)
        hit_p = o + np.where(hit, tk, 0.0)[:, None] * d
        mirror = is_mirror[kh]
        # mirror: reflect; diffuse: cosine sample
        d_ref = d - 2.0 * np.einsum("pj,pj->p", d, n)[:, None] * n
        u1 = rng.uniform(size=P)
        u2 = rng.uniform(size=P)
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        local = np.stack([r * np.cos(phi), r * np.sin(phi), np.sqrt(np.maximum(1 - u1, 0))], -1)
        up = np.where(
            (np.abs(n[:, 2]) > 0.9)[:, None], np.array([1.0, 0, 0]), np.array([0, 0, 1.0])
        )
        tx = np.cross(up, n)
        tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
        ty = np.cross(n, tx)
        d_dif = local[:, 0:1] * tx + local[:, 1:2] * ty + local[:, 2:3] * n
        d = np.where(mirror[:, None], d_ref, d_dif)
        o = hit_p + n * 1e-3
    return L.mean(axis=0)


def test_oracle_mirror_scene_matches():
    """Cornell with a perfect-mirror tall box: validates specular transport +
    emitter-hit/NEE MIS interplay against the independent oracle."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec

    # rebuild cornell with a mirror tall box
    _, cam, bld = testscenes.cornell_box(width=24, height=24)
    mirror = bld.add_bsdf(BSDFSpec(btype=T.BSDF_SPECULAR, k_d=(0.9, 0.9, 0.9)))
    # tall box is object index 6 in testscenes.cornell_box
    bld.objects[6].bsdf_id = mirror
    scene = bld.compile()

    p0 = np.asarray(scene.geom.p0)
    e1 = np.asarray(scene.geom.e1)
    e2 = np.asarray(scene.geom.e2)
    obj = np.asarray(scene.geom.obj_idx)
    bid = np.asarray(scene.objects.bsdf_id)[obj]
    btype = np.asarray(scene.bsdfs.btype)[bid]
    kd = np.asarray(scene.bsdfs.k_d)[bid]
    eid = np.asarray(scene.objects.emitter_id)[obj]
    em = np.asarray(scene.emitters.emission) * np.asarray(scene.emitters.scaler)[:, None]
    emission = np.where((eid > 0)[:, None], em[np.maximum(eid, 0)], 0.0)
    scene_np = {
        "p0": p0, "e1": e1, "e2": e2, "albedo": kd, "emission": emission,
        "is_mirror": btype == T.BSDF_SPECULAR,
    }
    cam_np = {"R": np.asarray(cam.R), "t": np.asarray(cam.t), "focal": float(cam.focal)}

    md = MaxDepthParams(max_depth=3, max_diffuse=3, max_specular=3)
    img = np.asarray(pt.render(scene, cam, md, spp=160, seed=21, use_bvh=True))
    jax_mean = img.mean(axis=(0, 1))

    rng = np.random.default_rng(77)
    oracle_mean = np.zeros(3)
    reps = 4
    for _ in range(reps):
        oracle_mean += _oracle_mean_mirror(scene_np, cam_np, 24, 24, 200_000, 4, rng)
    oracle_mean /= reps
    rel = np.abs(jax_mean - oracle_mean) / np.maximum(oracle_mean, 1e-3)
    assert rel.max() < 0.08, (jax_mean, oracle_mean, rel)


def _oracle_mean_glass(scene_np, cam_np, w, h, n_paths, depth, rng):
    """Naive PT with diffuse + smooth-dielectric (glass) materials.

    Independent implementation of the standard physics: exact dielectric
    Fresnel, Snell refraction, TIR, and the radiance-transport 1/eta_rel^2
    factor on refraction (pbrt convention, matching translucent.cuh)."""
    p0, e1, e2 = scene_np["p0"], scene_np["e1"], scene_np["e2"]
    albedo, emission = scene_np["albedo"], scene_np["emission"]
    is_glass, tint, ior = scene_np["is_glass"], scene_np["tint"], scene_np["ior"]
    P = n_paths

    px = rng.uniform(0, w, P)
    py = rng.uniform(0, h, P)
    d_cam = np.stack([px - 0.5 * w, 0.5 * h - py, np.full(P, cam_np["focal"])], -1)
    d = d_cam @ cam_np["R"].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam_np["t"], (P, 3)).copy()
    thp = np.ones((P, 3))
    L = np.zeros((P, 3))
    alive = np.ones(P, bool)

    for _ in range(depth):
        h_ = np.cross(d[:, None, :], e2[None])
        a = np.einsum("nj,pnj->pn", e1, h_)
        f = 1.0 / np.where(np.abs(a) < 1e-12, 1e-12, a)
        s = o[:, None, :] - p0[None]
        u = f * np.einsum("pnj,pnj->pn", s, h_)
        q = np.cross(s, e1[None])
        v = f * np.einsum("pj,pnj->pn", d, q)
        t = f * np.einsum("nj,pnj->pn", e2, q)
        ok = (np.abs(a) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
        t = np.where(ok, t, np.inf)
        k = np.argmin(t, axis=1)
        tk = t[np.arange(P), k]
        hit = np.isfinite(tk) & alive
        alive = hit
        if not alive.any():
            break
        kh = np.where(hit, k, 0)
        L += np.where(hit[:, None], thp * emission[kh], 0.0)
        n = np.cross(e1[kh], e2[kh])
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        backside = np.einsum("pj,pj->p", n, d) > 0  # hit from inside
        n = np.where(backside[:, None], -n, n)  # n now faces the ray
        hit_p = o + np.where(hit, tk, 0.0)[:, None] * d
        glass = is_glass[kh]

        # --- dielectric branch -------------------------------------------
        cos_i = -np.einsum("pj,pj->p", d, n)  # > 0
        eta_rel = np.where(backside, 1.0 / ior[kh], ior[kh])  # n_t / n_i
        sin2_t = np.maximum(1.0 - cos_i * cos_i, 0.0) / (eta_rel * eta_rel)
        tir = sin2_t >= 1.0
        cos_t = np.sqrt(np.maximum(1.0 - sin2_t, 0.0))
        r_par = (eta_rel * cos_i - cos_t) / np.maximum(eta_rel * cos_i + cos_t, 1e-8)
        r_per = (cos_i - eta_rel * cos_t) / np.maximum(cos_i + eta_rel * cos_t, 1e-8)
        F = np.where(tir, 1.0, 0.5 * (r_par * r_par + r_per * r_per))
        u_f = rng.uniform(size=P)
        refl = (u_f < F) | tir
        d_ref = d + 2.0 * cos_i[:, None] * n
        inv_eta = 1.0 / eta_rel
        d_ref2 = d * inv_eta[:, None] + (inv_eta * cos_i - cos_t)[:, None] * n
        d_ref2 /= np.maximum(np.linalg.norm(d_ref2, axis=-1, keepdims=True), 1e-12)
        d_glass = np.where(refl[:, None], d_ref, d_ref2)
        w_glass = tint[kh] * np.where(
            refl, 1.0, 1.0 / (eta_rel * eta_rel)
        )[:, None]

        # --- diffuse branch ----------------------------------------------
        u1 = rng.uniform(size=P)
        u2 = rng.uniform(size=P)
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        local = np.stack([r * np.cos(phi), r * np.sin(phi), np.sqrt(np.maximum(1 - u1, 0))], -1)
        up = np.where(
            (np.abs(n[:, 2]) > 0.9)[:, None], np.array([1.0, 0, 0]), np.array([0, 0, 1.0])
        )
        tx = np.cross(up, n)
        tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
        ty = np.cross(n, tx)
        d_dif = local[:, 0:1] * tx + local[:, 1:2] * ty + local[:, 2:3] * n

        d = np.where(glass[:, None], d_glass, d_dif)
        thp = np.where(hit[:, None], thp * np.where(glass[:, None], w_glass, albedo[kh]), thp)
        off = np.where((glass & ~refl)[:, None], -n, n)  # cross surface on refract
        o = hit_p + off * 1e-3
    return L.mean(axis=0)


def test_oracle_glass_scene_matches():
    """Cornell with a smooth-dielectric tall box: validates refraction,
    Fresnel lobe choice, TIR, and the radiance eta^2 convention against the
    independent oracle (ROADMAP r1 #10 / VERDICT r1 weak 8)."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec

    _, cam, bld = testscenes.cornell_box(width=24, height=24)
    glass = bld.add_bsdf(
        BSDFSpec(btype=T.BSDF_TRANSLUCENT, k_s=(1.0, 1.0, 1.0), ior=1.5)
    )
    bld.objects[6].bsdf_id = glass  # tall box
    scene = bld.compile()

    p0 = np.asarray(scene.geom.p0)
    e1 = np.asarray(scene.geom.e1)
    e2 = np.asarray(scene.geom.e2)
    obj = np.asarray(scene.geom.obj_idx)
    bid = np.asarray(scene.objects.bsdf_id)[obj]
    btype = np.asarray(scene.bsdfs.btype)[bid]
    kd = np.asarray(scene.bsdfs.k_d)[bid]
    ks = np.asarray(scene.bsdfs.k_s)[bid]
    ior = np.asarray(scene.bsdfs.params)[bid, T.P_IOR]
    eid = np.asarray(scene.objects.emitter_id)[obj]
    em = np.asarray(scene.emitters.emission) * np.asarray(scene.emitters.scaler)[:, None]
    emission = np.where((eid > 0)[:, None], em[np.maximum(eid, 0)], 0.0)
    scene_np = {
        "p0": p0, "e1": e1, "e2": e2, "albedo": kd, "emission": emission,
        "is_glass": btype == T.BSDF_TRANSLUCENT, "tint": ks, "ior": ior,
    }
    cam_np = {"R": np.asarray(cam.R), "t": np.asarray(cam.t), "focal": float(cam.focal)}

    md = MaxDepthParams(max_depth=5, max_specular=5, max_transmit=5)
    img = np.asarray(pt.render(scene, cam, md, spp=160, seed=13, use_bvh=True))
    jax_mean = img.mean(axis=(0, 1))

    rng = np.random.default_rng(99)
    oracle_mean = np.zeros(3)
    reps = 4
    for _ in range(reps):
        oracle_mean += _oracle_mean_glass(scene_np, cam_np, 24, 24, 200_000, 6, rng)
    oracle_mean /= reps
    rel = np.abs(jax_mean - oracle_mean) / np.maximum(oracle_mean, 1e-3)
    assert rel.max() < 0.08, (jax_mean, oracle_mean, rel)


def _bilinear_wrap_np(img, uv):
    """Independent NumPy twin of textures.sample_texture (bilinear + wrap)."""
    H, W = img.shape[:2]
    u = uv[:, 0] - np.floor(uv[:, 0])
    v = uv[:, 1] - np.floor(uv[:, 1])
    x = u * W - 0.5
    y = v * H - 0.5
    x0 = np.floor(x)
    y0 = np.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def fetch(xi, yi):
        return img[np.mod(yi.astype(np.int64), H), np.mod(xi.astype(np.int64), W)]

    return (
        fetch(x0, y0) * (1 - fx) * (1 - fy)
        + fetch(x0 + 1, y0) * fx * (1 - fy)
        + fetch(x0, y0 + 1) * (1 - fx) * fy
        + fetch(x0 + 1, y0 + 1) * fx * fy
    )


def _oracle_mean_textured(scene_np, cam_np, w, h, n_paths, depth, rng):
    """Naive cosine PT where diffuse albedo is modulated by a bilinear
    texture looked up at barycentric-interpolated UVs."""
    p0, e1, e2 = scene_np["p0"], scene_np["e1"], scene_np["e2"]
    albedo, emission = scene_np["albedo"], scene_np["emission"]
    uv0, uv1, uv2 = scene_np["uv0"], scene_np["uv1"], scene_np["uv2"]
    tex_img, has_tex = scene_np["tex_img"], scene_np["has_tex"]
    P = n_paths

    px = rng.uniform(0, w, P)
    py = rng.uniform(0, h, P)
    d_cam = np.stack([px - 0.5 * w, 0.5 * h - py, np.full(P, cam_np["focal"])], -1)
    d = d_cam @ cam_np["R"].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam_np["t"], (P, 3)).copy()
    thp = np.ones((P, 3))
    L = np.zeros((P, 3))
    alive = np.ones(P, bool)

    for _ in range(depth):
        h_ = np.cross(d[:, None, :], e2[None])
        a = np.einsum("nj,pnj->pn", e1, h_)
        f = 1.0 / np.where(np.abs(a) < 1e-12, 1e-12, a)
        s = o[:, None, :] - p0[None]
        u = f * np.einsum("pnj,pnj->pn", s, h_)
        q = np.cross(s, e1[None])
        v = f * np.einsum("pj,pnj->pn", d, q)
        t = f * np.einsum("nj,pnj->pn", e2, q)
        ok = (np.abs(a) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
        t = np.where(ok, t, np.inf)
        k = np.argmin(t, axis=1)
        ar = np.arange(P)
        tk = t[ar, k]
        hit = np.isfinite(tk) & alive
        alive = hit
        if not alive.any():
            break
        kh = np.where(hit, k, 0)
        L += np.where(hit[:, None], thp * emission[kh], 0.0)
        b1 = u[ar, kh]
        b2 = v[ar, kh]
        uvh = (
            uv0[kh] * (1.0 - b1 - b2)[:, None]
            + uv1[kh] * b1[:, None]
            + uv2[kh] * b2[:, None]
        )
        mod = np.where(
            has_tex[kh][:, None], _bilinear_wrap_np(tex_img, uvh), 1.0
        )
        n = np.cross(e1[kh], e2[kh])
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        flip = np.einsum("pj,pj->p", n, d) > 0
        n = np.where(flip[:, None], -n, n)
        thp = np.where(hit[:, None], thp * albedo[kh] * mod, thp)
        hit_p = o + np.where(hit, tk, 0.0)[:, None] * d
        u1 = rng.uniform(size=P)
        u2_ = rng.uniform(size=P)
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2_
        local = np.stack(
            [r * np.cos(phi), r * np.sin(phi), np.sqrt(np.maximum(1 - u1, 0))], -1
        )
        up = np.where(
            (np.abs(n[:, 2]) > 0.9)[:, None], np.array([1.0, 0, 0]), np.array([0, 0, 1.0])
        )
        tx = np.cross(up, n)
        tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
        ty = np.cross(n, tx)
        d = local[:, 0:1] * tx + local[:, 1:2] * ty + local[:, 2:3] * n
        o = hit_p + n * 1e-3
    return L.mean(axis=0)


def test_oracle_textured_scene_matches():
    """Cornell with a checkerboard diffuse texture on the floor: validates
    barycentric UV interpolation + bilinear wrap sampling + albedo
    modulation against the independent oracle (VERDICT r1 weak 8)."""
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec

    _, cam, bld = testscenes.cornell_box(width=24, height=24)
    rng0 = np.random.default_rng(7)
    checker = np.ones((8, 8, 4), np.float32)
    checker[..., :3] = rng0.uniform(0.2, 1.0, size=(8, 8, 1)).astype(np.float32)
    tid = bld.add_texture(checker)
    tex_mat = bld.add_bsdf(
        BSDFSpec(k_d=(0.8, 0.8, 0.8), tex_ids=(tid, -1, -1, -1, -1))
    )
    # floor is object 0, two triangles with corners (0,0,0)(1,0,0)(1,0,1)
    # and (0,0,0)(1,0,1)(0,0,1); give it uv = (x, z)
    bld.objects[0].bsdf_id = tex_mat
    bld.objects[0].uv = np.asarray(
        [
            [[0, 0], [1, 0], [1, 1]],
            [[0, 0], [1, 1], [0, 1]],
        ],
        np.float32,
    )
    scene = bld.compile()

    p0 = np.asarray(scene.geom.p0)
    e1 = np.asarray(scene.geom.e1)
    e2 = np.asarray(scene.geom.e2)
    obj = np.asarray(scene.geom.obj_idx)
    bid = np.asarray(scene.objects.bsdf_id)[obj]
    kd = np.asarray(scene.bsdfs.k_d)[bid]
    eid = np.asarray(scene.objects.emitter_id)[obj]
    em = np.asarray(scene.emitters.emission) * np.asarray(scene.emitters.scaler)[:, None]
    emission = np.where((eid > 0)[:, None], em[np.maximum(eid, 0)], 0.0)
    has_tex = np.asarray(scene.bsdfs.tex_ids)[bid, T.TEX_DIFFUSE] >= 0
    scene_np = {
        "p0": p0, "e1": e1, "e2": e2, "albedo": kd, "emission": emission,
        "uv0": np.asarray(scene.geom.uv0), "uv1": np.asarray(scene.geom.uv1),
        "uv2": np.asarray(scene.geom.uv2),
        "tex_img": checker[..., :3].astype(np.float64), "has_tex": has_tex,
    }
    cam_np = {"R": np.asarray(cam.R), "t": np.asarray(cam.t), "focal": float(cam.focal)}

    md = MaxDepthParams(max_depth=3, max_diffuse=3)
    img = np.asarray(pt.render(scene, cam, md, spp=128, seed=17, use_bvh=True))
    jax_mean = img.mean(axis=(0, 1))

    rng = np.random.default_rng(55)
    oracle_mean = np.zeros(3)
    reps = 4
    for _ in range(reps):
        oracle_mean += _oracle_mean_textured(scene_np, cam_np, 24, 24, 200_000, 4, rng)
    oracle_mean /= reps
    rel = np.abs(jax_mean - oracle_mean) / np.maximum(oracle_mean, 1e-3)
    assert rel.max() < 0.06, (jax_mean, oracle_mean, rel)


def test_uv_interpolation_matches_hit_coordinates():
    """Deterministic pin of barycentric UV orientation: with floor UVs set
    to (x, z), the interpolated UV at any hit must equal the hit point's
    (x, z) world coordinates."""
    import jax.numpy as jnp

    from cuda_pt_tpu.ops import intersect as isect
    from cuda_pt_tpu.scene import testscenes as ts

    _, _, bld = ts.cornell_box(width=8, height=8)
    bld.objects[0].uv = np.asarray(
        [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]], np.float32
    )
    scene = bld.compile()

    rng = np.random.default_rng(3)
    # strip in front of both interior boxes (z < 0.15) so every ray
    # reaches the floor
    xz = np.stack(
        [
            rng.uniform(0.05, 0.95, 16),
            rng.uniform(0.02, 0.12, 16),
        ],
        -1,
    ).astype(np.float32)
    o = jnp.asarray(
        np.stack([xz[:, 0], np.full(16, 0.7, np.float32), xz[:, 1]], -1)
    )
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (16, 3))
    hit = isect.closest_hit_brute(scene.geom, o, d)
    assert bool(jnp.all(hit["hit"]))
    p_hit = o + hit["t"][:, None] * d
    si = isect.surface_interaction(
        scene.geom, hit["prim"], hit["b1"], hit["b2"], p_hit, d
    )
    np.testing.assert_allclose(np.asarray(si["uv"]), xz, atol=1e-4)


# ---------------------------------------------------------------------------
# envmap oracle: independent lat-long lookup incl. azimuth/zenith rotation
# ---------------------------------------------------------------------------


def _env_lookup_np(d, tex, azimuth, zenith, scale):
    """Independent NumPy lat-long envmap radiance: zenith pitch about +x,
    azimuth as a phi offset, bilinear fetch with wrap (the documented
    convention of emitters.env_radiance / textures.sample_texture)."""
    c, s = np.cos(zenith), np.sin(zenith)
    dy = c * d[:, 1] - s * d[:, 2]
    dz = s * d[:, 1] + c * d[:, 2]
    phi = np.arctan2(dz, d[:, 0]) + azimuth
    theta = np.arccos(np.clip(dy, -1.0, 1.0))
    u = phi / (2 * np.pi) + 0.5
    v = theta / np.pi
    hgt, wdt, _ = tex.shape
    u = u - np.floor(u)
    v = v - np.floor(v)
    x = u * wdt - 0.5
    y = v * hgt - 0.5
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def fetch(xi, yi):
        return tex[np.mod(yi, hgt), np.mod(xi, wdt)]

    c00, c10 = fetch(x0, y0), fetch(x0 + 1, y0)
    c01, c11 = fetch(x0, y0 + 1), fetch(x0 + 1, y0 + 1)
    col = (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
           + c01 * (1 - fx) * fy + c11 * fx * fy)
    return col * scale


def _oracle_mean_envmap(cam_np, env, sphere, w, h, n_paths, depth, rng):
    """Naive cosine PT over one diffuse sphere under an envmap."""
    ctr, rad, albedo = sphere
    P = n_paths
    px = rng.uniform(0, w, P)
    py = rng.uniform(0, h, P)
    d_cam = np.stack([px - 0.5 * w, 0.5 * h - py, np.full(P, cam_np["focal"])], -1)
    d = d_cam @ cam_np["R"].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(cam_np["t"], (P, 3)).copy()
    thp = np.ones((P, 3))
    L = np.zeros((P, 3))
    alive = np.ones(P, bool)

    for _ in range(depth):
        oc = o - ctr
        b = np.einsum("pj,pj->p", oc, d)
        cq = np.einsum("pj,pj->p", oc, oc) - rad * rad
        disc = b * b - cq
        sq = np.sqrt(np.maximum(disc, 0.0))
        t0, t1 = -b - sq, -b + sq
        t = np.where(t0 > 1e-4, t0, t1)
        hit = (disc > 0) & (t > 1e-4) & alive
        miss = alive & ~hit
        L += np.where(miss[:, None], thp * _env_lookup_np(d, *env), 0.0)
        alive = hit
        if not alive.any():
            break
        hp = o + t[:, None] * d
        n = (hp - ctr) / rad
        flip = np.einsum("pj,pj->p", n, d) > 0
        n = np.where(flip[:, None], -n, n)
        thp = np.where(hit[:, None], thp * albedo, thp)
        u1, u2 = rng.uniform(size=P), rng.uniform(size=P)
        r_ = np.sqrt(u1)
        phi = 2 * np.pi * u2
        local = np.stack([r_ * np.cos(phi), r_ * np.sin(phi),
                          np.sqrt(np.maximum(1 - u1, 0))], -1)
        up = np.where((np.abs(n[:, 2]) > 0.9)[:, None],
                      np.array([1.0, 0, 0]), np.array([0, 0, 1.0]))
        tx = np.cross(up, n)
        tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
        ty = np.cross(n, tx)
        d = local[:, 0:1] * tx + local[:, 1:2] * ty + local[:, 2:3] * n
        o = hp + n * 1e-3
    return L.mean(axis=0)


def test_oracle_envmap_scene_matches():
    """Diffuse sphere under a rotated (azimuth + zenith) smooth envmap: the
    framework's env NEE + MIS + importance sampling + miss-eval must agree
    with an independent naive oracle — pins the lat-long parameterization,
    the rotation conventions, bilinear filtering and absolute scaling."""
    from cuda_pt_tpu.core import camera as cam_mod
    from cuda_pt_tpu.scene import types as T
    from cuda_pt_tpu.scene.builder import BSDFSpec, EmitterSpec, SceneBuilder

    hgt, wdt = 16, 32
    yy, xx = np.meshgrid(np.arange(hgt), np.arange(wdt), indexing="ij")
    tex = np.stack([
        0.3 + 1.5 * (1 + np.cos(2 * np.pi * xx / wdt)) / 2 * (1 - yy / hgt),
        0.2 + 0.9 * (yy / hgt),
        0.25 + 0.8 * (1 + np.sin(2 * np.pi * xx / wdt)) / 2,
    ], axis=-1).astype(np.float32)
    azimuth, zenith, scale = 0.7, 0.3, 1.3
    albedo = np.array([0.7, 0.5, 0.4])

    b = SceneBuilder()
    mat = b.add_bsdf(BSDFSpec(k_d=tuple(albedo)))
    tid = b.add_texture(tex)
    b.add_emitter(EmitterSpec(
        etype=T.EMITTER_ENVMAP, emission=(1, 1, 1), scaler=1.0,
        extra=(scale, azimuth, zenith, 0.0), tex_id=tid))
    b.add_sphere((0.0, 0.0, 0.0), 0.8, mat)
    scene = b.compile()
    cam = cam_mod.make_camera((0, 0.6, -3), (0, 0, 0), fov=40,
                              width=24, height=24)

    md = MaxDepthParams(max_depth=3, max_diffuse=3)
    img = np.asarray(pt.render(scene, cam, md, spp=196, seed=17, use_bvh=False))
    jax_mean = img.mean(axis=(0, 1))

    cam_np = {"R": np.asarray(cam.R), "t": np.asarray(cam.t),
              "focal": float(cam.focal)}
    rng = np.random.default_rng(321)
    oracle_mean = np.zeros(3)
    reps = 4
    for _ in range(reps):
        oracle_mean += _oracle_mean_envmap(
            cam_np, (tex, azimuth, zenith, scale),
            (np.zeros(3), 0.8, albedo), 24, 24, 200_000, 4, rng)
    oracle_mean /= reps

    rel = np.abs(jax_mean - oracle_mean) / np.maximum(oracle_mean, 1e-3)
    assert rel.max() < 0.06, (jax_mean, oracle_mean, rel)
