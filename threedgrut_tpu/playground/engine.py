"""Hybrid 3DGRUT playground engine (headless).

TPU redesign of threedgrut_playground/engine.py (Engine3DGRUT) + the
hybrid OptiX path tracer (src/kernels/cuda/playgroundKernel.cu:39-288):
primary rays are rasterized/traced against the Gaussian mixture, mesh
primitives (glass / mirror / diffuse / PBR) are intersected analytically,
and secondary rays alternate mesh closest-hits with volumetric Gaussian
segment integration. Environment maps shade misses; depth-of-field and
SPP accumulation use a jittered aperture.

All per-bounce work is batched over every pixel (no per-ray recursion):
a fixed MAX_BOUNCES loop with masked state updates - the XLA-friendly
reformulation of the CUDA while-loop path tracer.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianState
from ..render.grt import trace
from .mesh import Mesh, TriangleSoup


@dataclasses.dataclass
class PBRMaterial:
    """threedgrut_playground/engine.py:98 (PBRMaterial) equivalent."""
    kind: str = "diffuse"          # diffuse | mirror | glass | pbr
    base_color: tuple = (0.8, 0.8, 0.8)
    roughness: float = 0.4
    metallic: float = 0.0
    ior: float = 1.45
    emissive: tuple = (0.0, 0.0, 0.0)
    transmission: float = 0.0      # PBR refraction lobe weight
    # texture maps sampled at the hit's interpolated TEXCOORD_0 uv
    # (reference engine.py:105-112 diffuse_map/emissive_map; factors
    # multiply the sampled texel per glTF 2.0 semantics). [H, W, 3+]
    # float arrays in [0, 1]; None = constant factor only.
    diffuse_map: Optional[object] = None
    emissive_map: Optional[object] = None


@dataclasses.dataclass
class EngineConfig:
    max_bounces: int = 4
    spp: int = 1
    spp_mode: str = "msaa"         # none|independent_random|msaa|low_discrepancy_seq
    aperture: float = 0.0          # depth of field (0 = pinhole)
    focus_distance: float = 3.0
    use_envmap: bool = True
    gaussian_sh_degree: int = 3
    denoise: bool = False          # denoiser pass on the finished frame
    # "cnn" = learned residual CNN (denoise_cnn.py, the analogue of the
    # reference's OptiX AI denoiser pass, hybridTracer.cpp:503), falling
    # back to "atrous" when the committed weights are absent; "atrous" =
    # the edge-avoiding wavelet filter unconditionally
    denoiser: str = "cnn"


class EnvironmentMap:
    """Lat-long HDR environment lookup (engine.py envmap path)."""

    def __init__(self, image: Optional[np.ndarray] = None,
                 constant=(0.5, 0.6, 0.8)):
        if image is None:
            self.image = None
            self.constant = jnp.asarray(constant, jnp.float32)
        else:
            self.image = jnp.asarray(image, jnp.float32)
            self.constant = None

    def sample(self, dirs: jnp.ndarray) -> jnp.ndarray:
        if self.image is None:
            return jnp.broadcast_to(self.constant, dirs.shape[:-1] + (3,))
        h, w = self.image.shape[:2]
        u = (jnp.arctan2(dirs[..., 0], dirs[..., 2]) / (2 * jnp.pi) + 0.5)
        v = jnp.arccos(jnp.clip(dirs[..., 1], -1, 1)) / jnp.pi
        x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        return self.image[y, x]


def _reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def _refract(d, n, eta):
    """Refract d through normal n with relative IOR eta; falls back to
    reflection on total internal reflection."""
    cos_i = -jnp.sum(d * n, axis=-1, keepdims=True)
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    refr = eta * d + (eta * cos_i - cos_t) * n
    return jnp.where(tir, _reflect(d, n), refr), tir


class Engine3DGRUT:
    """Headless hybrid renderer over a GaussianState + mesh primitives."""

    def __init__(self, model: GaussianState,
                 config: Optional[EngineConfig] = None,
                 envmap: Optional[EnvironmentMap] = None):
        self.model = model
        self.config = config or EngineConfig()
        self.envmap = envmap or EnvironmentMap()
        self.meshes: List[Mesh] = []
        self.materials: List[PBRMaterial] = [PBRMaterial()]
        self._soup = None

    # --- primitives registry (engine.py:264 Primitives) ----------------
    def add_primitive(self, mesh: Mesh, material: PBRMaterial):
        mesh.material_id = len(self.materials)
        self.materials.append(material)
        self.meshes.append(mesh)
        self._soup = None

    def add_glb(self, path: str, kind: str = "pbr"):
        """Load a .glb asset with its glTF materials and textures
        (reference mesh_io.py:44-112 load_materials + texture upload).
        Returns the number of primitives added."""
        from .mesh import load_glb_scene
        meshes, mats = load_glb_scene(path)
        base = len(self.materials)
        for md in mats:
            self.materials.append(PBRMaterial(
                kind=kind, base_color=md["base_color"],
                roughness=md["roughness"], metallic=md["metallic"],
                ior=md["ior"], emissive=md["emissive"],
                transmission=md["transmission"],
                diffuse_map=md["diffuse_map"],
                emissive_map=md["emissive_map"]))
        for m in meshes:
            m.material_id += base
            self.meshes.append(m)
        self._soup = None
        return len(meshes)

    def _get_soup(self):
        if self._soup is None:
            # dense soup for prop-scale meshes, Morton-clustered AABB
            # culling for large scenes (mesh.py ClusteredTriangles - the
            # TPU stand-in for the reference's OptiX mesh GAS)
            from .mesh import make_intersector
            self._soup = make_intersector(self.meshes)
        return self._soup

    def _material_arrays(self):
        mats = self.materials
        out = dict(
            kind=jnp.asarray([{"diffuse": 0, "mirror": 1, "glass": 2,
                               "pbr": 3}[m.kind] for m in mats]),
            base_color=jnp.asarray([m.base_color for m in mats],
                                   jnp.float32),
            roughness=jnp.asarray([m.roughness for m in mats], jnp.float32),
            metallic=jnp.asarray([m.metallic for m in mats], jnp.float32),
            ior=jnp.asarray([m.ior for m in mats], jnp.float32),
            emissive=jnp.asarray([m.emissive for m in mats], jnp.float32),
            transmission=jnp.asarray([m.transmission for m in mats],
                                     jnp.float32),
        )
        for attr in ("diffuse_map", "emissive_map"):
            if any(getattr(m, attr) is not None for m in mats):
                out[attr] = self._texture_atlas(attr)
        return out

    def _texture_atlas(self, attr):
        """Per-material texture maps packed as one padded [M, Hmax,
        Wmax, 3] atlas + (h [M], w [M], has [M]) sideband. Materials
        without a map sample as 1.0 (constant factor passes through)."""
        import numpy as np
        maps = [getattr(m, attr) for m in self.materials]
        hs = [np.asarray(im).shape[0] if im is not None else 1
              for im in maps]
        ws = [np.asarray(im).shape[1] if im is not None else 1
              for im in maps]
        atlas = np.ones((len(maps), max(hs), max(ws), 3), np.float32)
        for i, im in enumerate(maps):
            if im is None:
                continue
            a = np.asarray(im, np.float32)
            if a.ndim == 2:
                a = a[..., None]
            if a.shape[-1] == 1:
                a = np.repeat(a, 3, axis=-1)
            atlas[i, :hs[i], :ws[i]] = a[..., :3]
        return (jnp.asarray(atlas), jnp.asarray(hs, jnp.int32),
                jnp.asarray(ws, jnp.int32),
                jnp.asarray([im is not None for im in maps], jnp.float32))

    @staticmethod
    def _sample_texture(tex, m, uv):
        """Nearest-texel sample of atlas ``tex`` for per-ray material m
        at uv (glTF REPEAT wrap, v-down convention); rays whose material
        has no map sample 1.0."""
        atlas, hs, ws, has = tex
        h = hs[m].astype(jnp.float32)
        w = ws[m].astype(jnp.float32)
        u = uv[:, 0] - jnp.floor(uv[:, 0])
        v = uv[:, 1] - jnp.floor(uv[:, 1])
        x = jnp.clip((u * w).astype(jnp.int32), 0, ws[m] - 1)
        y = jnp.clip((v * h).astype(jnp.int32), 0, hs[m] - 1)
        texel = atlas[m, y, x]
        return jnp.where(has[m][:, None] > 0, texel,
                         jnp.ones_like(texel))

    # --- rendering ------------------------------------------------------
    def render_rays(self, ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                    key=None, frame_number: int = 0) -> jnp.ndarray:
        """Path-trace a flat batch of rays -> RGB [R, 3]."""
        from .materials import sample_microfacet_brdf
        from .sampling import pcg3d_float

        cfg = self.config
        soup = self._get_soup()
        mats = self._material_arrays()
        r = ray_o.shape[0]

        radiance = jnp.zeros((r, 3))
        throughput = jnp.ones((r, 3))
        alive = jnp.ones(r, bool)
        o, d = ray_o, ray_d
        key = key if key is not None else jax.random.PRNGKey(0)
        ray_idx = jnp.arange(r, dtype=jnp.uint32)

        for bounce in range(cfg.max_bounces):
            t_hit, tri, normal, mat_id, uv = soup.closest_hit(o, d)
            # volumetric gaussians along [eps, t_hit]
            gs = trace(self.model, o, d,
                       sh_degree=cfg.gaussian_sh_degree,
                       t_min=1e-4, t_max=t_hit)
            vol_rgb = gs["pred_features"]
            vol_alpha = gs["pred_opacity"][:, 0]
            radiance = radiance + jnp.where(
                alive[:, None], throughput * vol_rgb, 0.0)
            throughput = throughput * jnp.where(
                alive[:, None], (1.0 - vol_alpha)[:, None], 1.0)

            miss = mat_id < 0
            env = self.envmap.sample(d)
            radiance = radiance + jnp.where(
                (alive & miss)[:, None], throughput * env, 0.0)
            alive = alive & ~miss

            # mesh interaction; texture maps modulate the constant
            # factors at the hit uv (reference engine.py:101-131)
            m = jnp.maximum(mat_id, 0)
            kind = mats["kind"][m]
            base = mats["base_color"][m]
            emissive = mats["emissive"][m]
            if "diffuse_map" in mats:
                base = base * self._sample_texture(mats["diffuse_map"],
                                                   m, uv)
            if "emissive_map" in mats:
                emissive = emissive * self._sample_texture(
                    mats["emissive_map"], m, uv)
            radiance = radiance + jnp.where(alive[:, None],
                                            throughput * emissive, 0.0)

            hit_p = o + d * t_hit[:, None]
            # glass: refract through the surface (relative IOR by side)
            eta = 1.0 / mats["ior"][m]
            refr_d, _ = _refract(d, normal, eta[:, None])
            refl_d = _reflect(d, normal)
            # diffuse solids terminate with env-lit base color (the
            # reference's flat get_diffuse_color shading for non-PBR
            # solids, materials.cuh:39)
            n_dot = jnp.abs(jnp.sum(normal * d, axis=-1, keepdims=True))
            diffuse_rgb = base * self.envmap.sample(normal) * n_dot
            is_glass = kind == 2
            is_mirror = kind == 1
            is_pbr = kind == 3
            continues = is_glass | is_mirror | is_pbr

            radiance = radiance + jnp.where(
                (alive & ~continues)[:, None],
                throughput * diffuse_rgb, 0.0)
            alive = alive & continues

            # PBR: stochastic microfacet bounce (materials.cuh:248) with
            # the reference's PCG3D per-(pixel, frame, bounce) seeding
            rand3 = pcg3d_float(jnp.stack(
                [ray_idx,
                 jnp.full((r,), frame_number, jnp.uint32),
                 jnp.full((r,), bounce + 1, jnp.uint32)], axis=-1))
            pbr_d, pbr_factor = sample_microfacet_brdf(
                -d, normal, base, mats["metallic"][m][:, None],
                mats["roughness"][m][:, None],
                mats["transmission"][m][:, None],
                mats["ior"][m][:, None], rand3)

            new_d = jnp.where(is_pbr[:, None], pbr_d,
                              jnp.where(is_glass[:, None], refr_d, refl_d))
            new_d = new_d / jnp.maximum(
                jnp.linalg.norm(new_d, axis=-1, keepdims=True), 1e-12)
            o = hit_p + new_d * 1e-3
            d = new_d
            factor = jnp.where(is_pbr[:, None], pbr_factor, base)
            throughput = throughput * jnp.where(
                alive[:, None], factor, 1.0)

        # leftover paths: shade with env
        radiance = radiance + jnp.where(alive[:, None],
                                        throughput * self.envmap.sample(d),
                                        0.0)
        return radiance

    def render_progressive(self, cam, key=None):
        """Generator of progressively-accumulated frames (the
        reference's has_more_to_accumulate render loop, engine.py:1005):
        yields the running [H, W, 3] average after every SPP batch so a
        GUI can display refinement; antialiasing jitter comes from the
        configured SPP mode and aperture sampling from the DoF sampler."""
        from ..render.common import camera_rays_world
        from .sampling import SPP, DepthOfField

        cfg = self.config
        key = key if key is not None else jax.random.PRNGKey(0)
        ro, rd = camera_rays_world(cam)
        h, w = ro.shape[:2]

        spp = SPP(mode=cfg.spp_mode, spp=cfg.spp)
        dof = (DepthOfField(spp=cfg.spp, aperture_size=cfg.aperture,
                            focus_z=cfg.focus_distance)
               if cfg.aperture > 0.0 else None)

        # pixel-space basis for subpixel jitter: d(ray)/d(pixel)
        dx = rd[:, 1:, :] - rd[:, :-1, :]
        dx = jnp.concatenate([dx, dx[:, -1:, :]], axis=1)
        dy = rd[1:, :, :] - rd[:-1, :, :]
        dy = jnp.concatenate([dy, dy[-1:, :, :]], axis=0)
        # camera frame for the aperture disc
        right = dx.reshape(-1, 3)[0]
        right = right / jnp.maximum(jnp.linalg.norm(right), 1e-12)
        up = dy.reshape(-1, 3)[0]
        up = up / jnp.maximum(jnp.linalg.norm(up), 1e-12)

        acc = jnp.zeros((h * w, 3))
        n = 0
        spp.reset_accumulation()
        while spp.has_more_to_accumulate():
            key, k2 = jax.random.split(key)
            jitter = spp(h, w)
            d = rd + jitter[..., 0:1] * dx + jitter[..., 1:2] * dy
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            o = ro.reshape(-1, 3)
            d = d.reshape(-1, 3)
            if dof is not None:
                o, d = dof(right, up, o, d)
            acc = acc + self.render_rays(o, d, key=k2, frame_number=n)
            n += 1
            yield np.asarray(
                jnp.clip((acc / n).reshape(h, w, 3), 0.0, 1.0))

    def render(self, cam, key=None) -> np.ndarray:
        """Render a full camera frame with SPP accumulation + DoF and
        the optional à-trous denoise pass."""
        img = None
        for img in self.render_progressive(cam, key=key):
            pass
        if self.config.denoise:
            if self.config.denoiser == "cnn":
                from .denoise_cnn import denoise_frame
                img = np.asarray(jnp.clip(
                    denoise_frame(jnp.asarray(img)), 0.0, 1.0))
            else:
                from .denoise import atrous_denoise
                img = np.asarray(jnp.clip(
                    atrous_denoise(jnp.asarray(img)), 0.0, 1.0))
        return img

    def render_fisheye(self, c2w: np.ndarray, fov: float,
                       width: int, height: int, key=None) -> np.ndarray:
        """Ideal wide-angle (equidistant) fisheye frame: out-of-fov
        pixels render black (reference playground _raygen_fisheye +
        mask compositing, engine.py:1362/1096)."""
        ro, rd, mask = fisheye_rays(c2w, fov, width, height)
        key = key if key is not None else jax.random.PRNGKey(0)
        rgb = self.render_rays(ro.reshape(-1, 3), rd.reshape(-1, 3),
                               key=key).reshape(height, width, 3)
        rgb = jnp.where(mask, rgb, 0.0)
        return np.asarray(jnp.clip(rgb, 0.0, 1.0))


def fisheye_rays(c2w: np.ndarray, fov: float, width: int, height: int,
                 eps: float = 1e-9):
    """Equidistant ("perfect") fisheye ray generation.

    Angular distance from the optical axis is proportional to the radial
    NDC distance (theta = r * fov / 2), so equal world angles are equally
    spaced in the image; pixels with r > 1 fall outside the field of view
    (reference playground utils/kaolin_future/fisheye.py
    generate_fisheye_rays semantics).

    Args:
        c2w: [4, 4] (or [3, 4]) camera-to-world transform, camera looks
            down +z with +x right / +y down.
        fov: full field of view in radians (may exceed pi).
    Returns:
        (ray_o [H, W, 3], ray_d [H, W, 3] world-space, mask [H, W, 1]).
    """
    c2w = jnp.asarray(c2w, jnp.float32)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    u = jnp.broadcast_to(xs[None, :], (height, width))
    v = jnp.broadcast_to(ys[:, None], (height, width))
    r = jnp.sqrt(u * u + v * v)
    mask = (r <= 1.0)[..., None]
    phi = jnp.arctan2(v, jnp.where(r > eps, u, 1.0))
    theta = r * fov * 0.5
    d_cam = jnp.stack([jnp.cos(phi) * jnp.sin(theta),
                       jnp.sin(phi) * jnp.sin(theta),
                       jnp.cos(theta)], axis=-1)
    rd = jnp.einsum("ij,hwj->hwi", c2w[:3, :3], d_cam)
    ro = jnp.broadcast_to(c2w[:3, 3], (height, width, 3))
    return ro, rd, mask
