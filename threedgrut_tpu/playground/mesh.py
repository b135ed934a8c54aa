"""Triangle meshes for the hybrid playground renderer.

Replaces the reference's OptiX mesh GAS + kaolin/pygltflib loaders
(threedgrut_playground/src/hybridTracer.cpp, utils/mesh_io) with a
self-contained OBJ parser and a fully vectorized Moller-Trumbore
closest-hit over the triangle soup (JAX: [R rays] x [T tris] - playground
meshes are small, so the dense test maps cleanly onto the VPU/MXU).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Mesh:
    vertices: np.ndarray    # [V, 3]
    faces: np.ndarray       # [F, 3] int32
    material_id: int = 0
    # per-vertex texture coordinates (glTF TEXCOORD_0 convention, v down);
    # None = untextured mesh (uv interpolates to 0)
    uvs: Optional[np.ndarray] = None   # [V, 2]

    @property
    def num_faces(self):
        return len(self.faces)


def load_obj(path: str, material_id: int = 0) -> Mesh:
    """Minimal OBJ parser: v / f lines (triangulates polygons as fans)."""
    verts: List[List[float]] = []
    faces: List[List[int]] = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) for p in parts[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return Mesh(vertices=np.asarray(verts, np.float32),
                faces=np.asarray(faces, np.int32), material_id=material_id)


_GLTF_DTYPE = {5120: np.int8, 5121: np.uint8, 5122: np.int16,
               5123: np.uint16, 5125: np.uint32, 5126: np.float32}
_GLTF_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _gltf_accessor(gltf: dict, bin_chunk: bytes, idx: int) -> np.ndarray:
    acc = gltf["accessors"][idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    dtype = _GLTF_DTYPE[acc["componentType"]]
    ncomp = _GLTF_NCOMP[acc["type"]]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride") or ncomp * np.dtype(dtype).itemsize
    count = acc["count"]
    raw = np.frombuffer(bin_chunk, np.uint8,
                        count=count * stride - (stride
                                                - ncomp
                                                * np.dtype(dtype).itemsize),
                        offset=offset)
    if stride == ncomp * np.dtype(dtype).itemsize:
        out = raw.view(dtype).reshape(count, ncomp)
    else:  # interleaved vertex buffer: de-stride per element
        rows = [raw[i * stride:i * stride
                    + ncomp * np.dtype(dtype).itemsize].view(dtype)
                for i in range(count)]
        out = np.stack(rows)
    return out


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m[:3, :3] *= np.asarray(node["scale"], np.float32)
    if "rotation" in node:  # gltf quaternion xyzw
        x, y, z, w = node["rotation"]
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)]], np.float32)
        m[:3, :3] = r @ m[:3, :3]
    if "translation" in node:
        m[:3, 3] = node["translation"]
    return m


def _gltf_image(gltf: dict, bin_chunk: bytes, idx: int,
                base_dir: str) -> Optional[np.ndarray]:
    """Decode gltf images[idx] -> float32 [H, W, C] in [0,1] (or None).

    Embedded images (bufferView) decode through the native libjpeg/libpng
    loader (native/dataio.cpp); external URIs resolve relative to the
    asset. Decoder unavailability degrades to None (constant factors)."""
    import os

    try:
        from ..data.native_loader import decode_image, decode_image_bytes
    except Exception:
        return None
    img = gltf.get("images", [])[idx]
    try:
        if "bufferView" in img:
            view = gltf["bufferViews"][img["bufferView"]]
            off = view.get("byteOffset", 0)
            raw = bin_chunk[off:off + view["byteLength"]]
            out = decode_image_bytes(bytes(raw))
        elif "uri" in img and not img["uri"].startswith("data:"):
            out = decode_image(os.path.join(base_dir, img["uri"]))
        else:
            return None
    except Exception:
        return None
    if out is None:
        return None
    return np.asarray(out, np.float32) / (
        255.0 if out.dtype == np.uint8 else 1.0)


def _gltf_material(gltf: dict, bin_chunk: bytes, idx: Optional[int],
                   base_dir: str) -> dict:
    """gltf materials[idx] -> plain dict mirroring the reference's
    PBRMaterial texture semantics (threedgrut_playground/engine.py:98:
    diffuse/emissive maps + constant factors, alpha cutoff, transmission,
    IOR)."""
    out = dict(base_color=(0.8, 0.8, 0.8), metallic=0.0, roughness=0.4,
               emissive=(0.0, 0.0, 0.0), transmission=0.0, ior=1.45,
               alpha_cutoff=0.5, diffuse_map=None, emissive_map=None)
    if idx is None or idx >= len(gltf.get("materials", [])):
        return out
    m = gltf["materials"][idx]
    pbr = m.get("pbrMetallicRoughness", {})
    bc = pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0])
    out["base_color"] = tuple(bc[:3])
    out["metallic"] = pbr.get("metallicFactor", 1.0)
    out["roughness"] = pbr.get("roughnessFactor", 1.0)
    out["emissive"] = tuple(m.get("emissiveFactor", [0.0, 0.0, 0.0]))
    out["alpha_cutoff"] = m.get("alphaCutoff", 0.5)
    ext = m.get("extensions", {})
    if "KHR_materials_transmission" in ext:
        out["transmission"] = ext["KHR_materials_transmission"].get(
            "transmissionFactor", 0.0)
    if "KHR_materials_ior" in ext:
        out["ior"] = ext["KHR_materials_ior"].get("ior", 1.45)
    textures = gltf.get("textures", [])

    def tex_image(tinfo):
        if tinfo is None:
            return None
        src = textures[tinfo["index"]].get("source")
        return None if src is None else _gltf_image(gltf, bin_chunk, src,
                                                    base_dir)

    out["diffuse_map"] = tex_image(pbr.get("baseColorTexture"))
    out["emissive_map"] = tex_image(m.get("emissiveTexture"))
    return out


def load_glb_scene(path: str):
    """Binary glTF (.glb) loader: POSITION + TEXCOORD_0 + indices +
    materials, scene-graph transforms.

    Covers the reference playground's pygltflib asset path
    (threedgrut_playground/utils/mesh_io.py:44-112, incl. its
    diffuse/emissive texture upload) without the dependency: parses the
    GLB container (header + JSON/BIN chunks) and flattens the default
    scene into world-space triangle meshes, one Mesh per primitive.

    Returns (meshes, materials): each mesh's ``material_id`` indexes the
    returned materials list (plain dicts -> Engine3DGRUT.add_glb builds
    PBRMaterials from them).
    """
    import json
    import os
    import struct

    with open(path, "rb") as f:
        data = f.read()
    magic, _version, _length = struct.unpack_from("<4sII", data, 0)
    if magic != b"glTF":
        raise ValueError(f"{path}: not a GLB file")
    pos, json_chunk, bin_chunk = 12, None, b""
    while pos + 8 <= len(data):
        clen, ctype = struct.unpack_from("<II", data, pos)
        chunk = data[pos + 8:pos + 8 + clen]
        if ctype == 0x4E4F534A:      # 'JSON'
            json_chunk = chunk
        elif ctype == 0x004E4942:    # 'BIN\0'
            bin_chunk = chunk
        pos += 8 + clen + (-clen % 4)
    if json_chunk is None:
        raise ValueError(f"{path}: GLB missing JSON chunk")
    gltf = json.loads(json_chunk)
    base_dir = os.path.dirname(os.path.abspath(path))

    meshes: List[Mesh] = []
    materials: List[dict] = []
    mat_local: dict = {}   # gltf material index (or None) -> local id

    def local_mat(gidx):
        if gidx not in mat_local:
            mat_local[gidx] = len(materials)
            materials.append(_gltf_material(gltf, bin_chunk, gidx,
                                            base_dir))
        return mat_local[gidx]

    def emit(mesh_idx: int, xform: np.ndarray):
        for prim in gltf["meshes"][mesh_idx].get("primitives", []):
            if prim.get("mode", 4) != 4:    # triangles only
                continue
            attrs = prim.get("attributes", {})
            if "POSITION" not in attrs:
                continue
            verts = _gltf_accessor(gltf, bin_chunk,
                                   attrs["POSITION"]).astype(np.float32)
            verts = verts @ xform[:3, :3].T + xform[:3, 3]
            if "indices" in prim:
                faces = _gltf_accessor(gltf, bin_chunk, prim["indices"])
                faces = faces.astype(np.int32).reshape(-1, 3)
            else:
                faces = np.arange(len(verts),
                                  dtype=np.int32).reshape(-1, 3)
            uvs = None
            if "TEXCOORD_0" in attrs:
                uvs = _gltf_accessor(gltf, bin_chunk, attrs["TEXCOORD_0"])
                acc = gltf["accessors"][attrs["TEXCOORD_0"]]
                if acc["componentType"] == 5121:      # normalized u8
                    uvs = uvs.astype(np.float32) / 255.0
                elif acc["componentType"] == 5123:    # normalized u16
                    uvs = uvs.astype(np.float32) / 65535.0
                uvs = uvs.astype(np.float32)
            meshes.append(Mesh(vertices=verts, faces=faces,
                               material_id=local_mat(prim.get("material")),
                               uvs=uvs))

    def walk(node_idx: int, parent: np.ndarray):
        node = gltf["nodes"][node_idx]
        xform = parent @ _node_matrix(node)
        if "mesh" in node:
            emit(node["mesh"], xform)
        for child in node.get("children", []):
            walk(child, xform)

    scenes = gltf.get("scenes", [])
    roots = (scenes[gltf.get("scene", 0)]["nodes"]
             if scenes else range(len(gltf.get("nodes", []))))
    for root in roots:
        walk(root, np.eye(4, dtype=np.float32))
    if not meshes and "meshes" in gltf:   # no scene graph: flat meshes
        for i in range(len(gltf["meshes"])):
            emit(i, np.eye(4, dtype=np.float32))
    return meshes, materials


def load_glb(path: str, material_id: int = 0) -> List[Mesh]:
    """Geometry-only GLB load (meshes tagged with ``material_id``)."""
    meshes, _ = load_glb_scene(path)
    for m in meshes:
        m.material_id = material_id
    return meshes


def load_mesh_file(path: str, material_id: int = 0) -> List[Mesh]:
    """Dispatch on extension: .obj -> [Mesh], .glb -> meshes per primitive."""
    if path.lower().endswith((".glb", ".gltf")):
        return load_glb(path, material_id)
    return [load_obj(path, material_id)]


def make_box(center, size, material_id: int = 0) -> Mesh:
    c = np.asarray(center, np.float32)
    s = np.asarray(size, np.float32) / 2
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], np.float32) * s + c
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for a, b, cc, d in quads:
        faces += [[a, b, cc], [a, cc, d]]
    return Mesh(vertices=corners, faces=np.asarray(faces, np.int32),
                material_id=material_id)


def make_icosphere(center, radius, subdivisions: int = 2,
                   material_id: int = 0) -> Mesh:
    phi = (1 + np.sqrt(5)) / 2
    v = np.array([[-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
                  [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
                  [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]],
                 np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int32)
    for _ in range(subdivisions):
        new_faces = []
        verts = list(v)
        cache = {}

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = verts[i] + verts[j]
                m = m / np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        v = np.asarray(verts, np.float32)
        f = np.asarray(new_faces, np.int32)
    return Mesh(vertices=(v * radius + np.asarray(center, np.float32))
                .astype(np.float32),
                faces=f, material_id=material_id)


class TriangleSoup:
    """Packed triangle arrays for vectorized intersection on device."""

    def __init__(self, meshes: List[Mesh]):
        v0, v1, v2, mats, uv = [], [], [], [], []
        for m in meshes:
            tv = m.vertices[m.faces]  # [F, 3, 3]
            v0.append(tv[:, 0]); v1.append(tv[:, 1]); v2.append(tv[:, 2])
            mats.append(np.full(len(m.faces), m.material_id, np.int32))
            if m.uvs is not None:
                uv.append(m.uvs[m.faces].astype(np.float32))  # [F, 3, 2]
            else:
                uv.append(np.zeros((len(m.faces), 3, 2), np.float32))
        if not v0:
            v0 = [np.zeros((1, 3), np.float32)]
            v1 = [np.zeros((1, 3), np.float32)]
            v2 = [np.zeros((1, 3), np.float32)]
            mats = [np.full(1, -1, np.int32)]
            uv = [np.zeros((1, 3, 2), np.float32)]
        self.v0 = jnp.asarray(np.concatenate(v0))
        self.e1 = jnp.asarray(np.concatenate(v1)) - self.v0
        self.e2 = jnp.asarray(np.concatenate(v2)) - self.v0
        self.material_id = jnp.asarray(np.concatenate(mats))
        uvf = np.concatenate(uv)                       # [F, 3, 2]
        self.uv0 = jnp.asarray(uvf[:, 0])
        self.uvd1 = jnp.asarray(uvf[:, 1] - uvf[:, 0])
        self.uvd2 = jnp.asarray(uvf[:, 2] - uvf[:, 0])

    def closest_hit(self, ray_o, ray_d, t_min=1e-4, t_max=1e7):
        """Vectorized Moller-Trumbore closest hit.

        ray_o/ray_d: [R, 3]. Returns (t [R], tri_idx [R] (-1 miss),
        normal [R,3] (geometric, facing the ray), material [R],
        uv [R,2] barycentric-interpolated texture coordinates).
        """
        pvec = jnp.cross(ray_d[:, None, :], self.e2[None])    # [R,F,3]
        det = jnp.sum(self.e1[None] * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
        tvec = ray_o[:, None, :] - self.v0[None]
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, self.e1[None])
        v = jnp.sum(ray_d[:, None, :] * qvec, axis=-1) * inv_det
        t = jnp.sum(self.e2[None] * qvec, axis=-1) * inv_det
        hit = ((jnp.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1)
               & (t > t_min) & (t < t_max) & (self.material_id[None] >= 0))
        t = jnp.where(hit, t, jnp.inf)
        tri = jnp.argmin(t, axis=1)
        t_best = jnp.take_along_axis(t, tri[:, None], axis=1)[:, 0]
        miss = ~jnp.isfinite(t_best)
        n = jnp.cross(self.e1[tri], self.e2[tri])
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                            1e-12)
        # face the incoming ray
        n = jnp.where(jnp.sum(n * ray_d, axis=-1, keepdims=True) > 0, -n, n)
        mat = jnp.where(miss, -1, self.material_id[tri])
        ub = jnp.take_along_axis(u, tri[:, None], axis=1)
        vb = jnp.take_along_axis(v, tri[:, None], axis=1)
        uv = self.uv0[tri] + ub * self.uvd1[tri] + vb * self.uvd2[tri]
        return (jnp.where(miss, 1e7, t_best), jnp.where(miss, -1, tri),
                n, mat, uv)


class ClusteredTriangles:
    """Large-mesh accelerator: Morton-ordered triangle clusters + per-ray-
    block AABB culling (the TPU equivalent of the reference's OptiX mesh
    GAS, hybridTracer.cpp).

    Triangles are sorted by the Morton code of their centroid and grouped
    into fixed-size clusters with AABBs. Rays are processed in blocks of
    256: each block slab-tests every cluster AABB (vectorized [256, M]),
    ranks clusters by nearest entry distance, and runs Moller-Trumbore
    only against the top ``max_clusters`` clusters (fixed shapes; XLA
    maps both phases onto the VPU/MXU). ``max_clusters`` bounds work AND
    correctness: blocks intersecting more clusters than the budget may
    miss hits behind the nearest ones - raise it for pathological scenes
    (the default covers the playground's prop+scene meshes).
    """

    CLUSTER = 64
    BLOCK = 256

    def __init__(self, meshes: List[Mesh], max_clusters: int = 64):
        soup = TriangleSoup(meshes)
        v0 = np.asarray(soup.v0)
        e1 = np.asarray(soup.e1)
        e2 = np.asarray(soup.e2)
        mat = np.asarray(soup.material_id)
        f = len(v0)
        # Morton order of centroids
        cent = v0 + (e1 + e2) / 3.0
        lo, hi = cent.min(0), cent.max(0)
        q = np.clip(((cent - lo) / np.maximum(hi - lo, 1e-9) * 1023), 0,
                    1023).astype(np.uint32)
        code = np.zeros(f, np.uint64)
        for b in range(10):
            for a in range(3):
                code |= ((q[:, a].astype(np.uint64) >> b) & 1) << (3 * b + a)
        order = np.argsort(code, kind="stable")
        pad = (-f) % self.CLUSTER
        order = np.concatenate([order, np.full(pad, order[-1] if f else 0)])
        if pad:
            # padded duplicate triangles are masked out via material -1
            mat = np.concatenate([mat, np.full(pad, -1, np.int32)])
            dup = order[f:]
            v0 = np.concatenate([v0, v0[dup]])
            e1 = np.concatenate([e1, e1[dup]])
            e2 = np.concatenate([e2, e2[dup]])
            idx = np.concatenate([np.arange(f), dup]).astype(np.int32)
            v0, e1, e2 = v0[order[:f + pad]], e1[order[:f + pad]], e2[order[:f + pad]]
        else:
            v0, e1, e2 = v0[order], e1[order], e2[order]
        mat_sorted = np.asarray(soup.material_id)[order % max(f, 1)] \
            if f else np.full(len(order), -1, np.int32)
        if pad:
            mat_sorted[f:] = -1
        self.tri_src = jnp.asarray(order.astype(np.int32))  # cluster row -> soup tri
        self.v0 = jnp.asarray(v0)
        self.e1 = jnp.asarray(e1)
        self.e2 = jnp.asarray(e2)
        self.material_id = jnp.asarray(mat_sorted)
        ordc = order % max(f, 1) if f else order * 0
        self.uv0 = jnp.asarray(np.asarray(soup.uv0)[ordc])
        self.uvd1 = jnp.asarray(np.asarray(soup.uvd1)[ordc])
        self.uvd2 = jnp.asarray(np.asarray(soup.uvd2)[ordc])
        m = len(v0) // self.CLUSTER
        tv = np.stack([v0, v0 + e1, v0 + e2], axis=1).reshape(
            m, self.CLUSTER * 3, 3)
        self.cluster_lo = jnp.asarray(tv.min(axis=1))
        self.cluster_hi = jnp.asarray(tv.max(axis=1))
        self.num_clusters = m
        self.max_clusters = min(max_clusters, m)

    def closest_hit(self, ray_o, ray_d, t_min=1e-4, t_max=1e7):
        """Same contract as TriangleSoup.closest_hit."""
        r = ray_o.shape[0]
        nb = max((r + self.BLOCK - 1) // self.BLOCK, 1)
        pad = nb * self.BLOCK - r
        ro = jnp.pad(ray_o, ((0, pad), (0, 0)))
        rd = jnp.pad(ray_d, ((0, pad), (0, 0)), constant_values=1.0)
        k = self.max_clusters
        c = self.CLUSTER

        def per_block(rays):
            o, d = rays[:, 0:3], rays[:, 3:6]
            inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
            t0 = (self.cluster_lo[None] - o[:, None]) * inv[:, None]
            t1 = (self.cluster_hi[None] - o[:, None]) * inv[:, None]
            tn = jnp.max(jnp.minimum(t0, t1), axis=-1)   # [256, M]
            tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
            hit = (tf >= jnp.maximum(tn, t_min)) & (tn < t_max)
            prio = jnp.min(jnp.where(hit, tn, jnp.inf), axis=0)  # [M]
            _, sel = jax.lax.top_k(-prio, k)             # [K] cluster ids
            rows = (sel[:, None] * c
                    + jnp.arange(c, dtype=jnp.int32)[None, :]).reshape(-1)
            v0, e1, e2 = self.v0[rows], self.e1[rows], self.e2[rows]
            matr = self.material_id[rows]
            pvec = jnp.cross(d[:, None, :], e2[None])
            det = jnp.sum(e1[None] * pvec, axis=-1)
            inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
            tvec = o[:, None, :] - v0[None]
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, e1[None])
            v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
            t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
            ok = ((jnp.abs(det) > 1e-9) & (u >= 0) & (v >= 0)
                  & (u + v <= 1) & (t > t_min) & (t < t_max)
                  & (matr[None] >= 0))
            t = jnp.where(ok, t, jnp.inf)
            j = jnp.argmin(t, axis=1)
            t_best = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
            rowj = rows[j]
            miss = ~jnp.isfinite(t_best)
            n = jnp.cross(self.e1[rowj], self.e2[rowj])
            n = n / jnp.maximum(
                jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
            n = jnp.where(jnp.sum(n * d, axis=-1, keepdims=True) > 0,
                          -n, n)
            tri = jnp.where(miss, -1, self.tri_src[rowj])
            mat = jnp.where(miss, -1, self.material_id[rowj])
            ub = jnp.take_along_axis(u, j[:, None], axis=1)
            vb = jnp.take_along_axis(v, j[:, None], axis=1)
            uv = self.uv0[rowj] + ub * self.uvd1[rowj] + vb * self.uvd2[rowj]
            return jnp.concatenate([
                jnp.where(miss, 1e7, t_best)[:, None],
                tri[:, None].astype(jnp.float32),
                n, mat[:, None].astype(jnp.float32), uv], axis=1)

        rays = jnp.concatenate([ro, rd], axis=1).reshape(nb, self.BLOCK, 6)
        out = jax.lax.map(per_block, rays).reshape(nb * self.BLOCK, 8)[:r]
        return (out[:, 0], out[:, 1].astype(jnp.int32), out[:, 2:5],
                out[:, 5].astype(jnp.int32), out[:, 6:8])


def make_intersector(meshes: List[Mesh], dense_threshold: int = 8192,
                     max_clusters: int = 64):
    """Pick the dense soup for small scenes, clusters for large ones."""
    n_faces = sum(m.num_faces for m in meshes) if meshes else 0
    if n_faces <= dense_threshold:
        return TriangleSoup(meshes)
    return ClusteredTriangles(meshes, max_clusters=max_clusters)
