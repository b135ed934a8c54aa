"""Hybrid playground engine: meshes, materials, env maps, path tracing."""

import jax.numpy as jnp
import numpy as np
import pytest

from scene_utils import make_test_scene
from threedgrut_tpu.playground.engine import (Engine3DGRUT, EngineConfig,
                                              EnvironmentMap, PBRMaterial)
from threedgrut_tpu.playground.mesh import (TriangleSoup, load_glb,
                                            load_mesh_file, make_box,
                                            make_icosphere)


def write_test_glb(path):
    """Two-triangle quad under a translated node, u16 indices."""
    import json
    import struct

    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float32)
    faces = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)
    vbytes = verts.tobytes()
    ibytes = faces.tobytes() + b"\x00\x00"  # pad to 4
    gltf = {
        "asset": {"version": "2.0"}, "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0, 0, 5]}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(vbytes)},
            {"buffer": 0, "byteOffset": len(vbytes),
             "byteLength": len(faces.tobytes())}],
        "buffers": [{"byteLength": len(vbytes) + len(ibytes)}],
    }
    jchunk = json.dumps(gltf).encode()
    jchunk += b" " * (-len(jchunk) % 4)
    bchunk = vbytes + ibytes
    body = (struct.pack("<II", len(jchunk), 0x4E4F534A) + jchunk
            + struct.pack("<II", len(bchunk), 0x004E4942) + bchunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<4sII", b"glTF", 2, 12 + len(body)) + body)


class TestMesh:
    def test_box_closest_hit(self):
        soup = TriangleSoup([make_box((0, 0, 5), (2, 2, 2))])
        ro = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
        rd = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        t, tri, n, mat, _uv = soup.closest_hit(ro, rd)
        np.testing.assert_allclose(float(t[0]), 4.0, atol=1e-5)
        assert int(tri[1]) == -1  # second ray misses
        np.testing.assert_allclose(np.asarray(n[0]), [0, 0, -1], atol=1e-5)

    def test_glb_roundtrip(self, tmp_path):
        p = str(tmp_path / "quad.glb")
        write_test_glb(p)
        meshes = load_glb(p)
        assert len(meshes) == 1
        m = meshes[0]
        assert m.faces.shape == (2, 3)
        # node translation [0,0,5] applied
        np.testing.assert_allclose(m.vertices[:, 2], 5.0)
        np.testing.assert_allclose(m.vertices[2], [1, 1, 5], atol=1e-6)
        # dispatcher picks the glb path and the soup is hittable
        soup = TriangleSoup(load_mesh_file(p))
        t, tri, n, mat, _uv = soup.closest_hit(
            jnp.asarray([[0.5, 0.5, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(float(t[0]), 5.0, atol=1e-5)

    def test_icosphere_hit_distance(self):
        soup = TriangleSoup([make_icosphere((0, 0, 3), 1.0, 3)])
        t, tri, n, mat, _uv = soup.closest_hit(
            jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(float(t[0]), 2.0, atol=0.02)


class TestEngine:
    def _engine(self, **cfg):
        _, model = make_test_scene(n=32, seed=0)
        eng = Engine3DGRUT(model, EngineConfig(max_bounces=2, **cfg),
                           EnvironmentMap(constant=(0.2, 0.3, 0.4)))
        return eng

    @pytest.mark.slow
    def test_envmap_only(self):
        eng = self._engine()
        # ray pointing away from all particles -> pure envmap
        rgb = eng.render_rays(jnp.asarray([[0.0, 0.0, -50.0]]),
                              jnp.asarray([[0.0, 0.0, -1.0]]))
        np.testing.assert_allclose(np.asarray(rgb[0]), [0.2, 0.3, 0.4],
                                   atol=0.02)

    @pytest.mark.slow
    def test_mirror_bounce(self):
        eng = self._engine()
        # mirror plane box far from particles; ray hits it and reflects to env
        eng.add_primitive(make_box((0, 0, -20), (10, 10, 0.2)),
                          PBRMaterial(kind="mirror", base_color=(1, 1, 1)))
        rgb = eng.render_rays(jnp.asarray([[0.0, 0.0, -25.0]]),
                              jnp.asarray([[0.0, 0.0, 1.0]]))
        assert np.all(np.asarray(rgb[0]) > 0.05)

    @pytest.mark.slow
    def test_gaussians_contribute(self):
        eng = self._engine()
        rgb_through = eng.render_rays(jnp.asarray([[0.0, 0.0, 0.0]]),
                                      jnp.asarray([[0.0, 0.0, 1.0]]))
        rgb_away = eng.render_rays(jnp.asarray([[0.0, 0.0, 0.0]]),
                                   jnp.asarray([[0.0, 0.0, -1.0]]))
        # the ray through the particle cloud differs from the env-only ray
        assert np.abs(np.asarray(rgb_through) - np.asarray(rgb_away)).max() \
            > 0.01

    @pytest.mark.slow
    def test_full_frame_render_with_dof(self):
        cam, model = make_test_scene(n=24, seed=1, res=(32, 32))
        eng = Engine3DGRUT(model, EngineConfig(max_bounces=1, spp=2,
                                               aperture=0.02,
                                               gaussian_sh_degree=1))
        img = eng.render(cam)
        assert img.shape == (32, 32, 3)
        assert np.all(np.isfinite(img))


class TestClusteredTriangles:
    def test_matches_dense_soup(self):
        import jax.numpy as jnp

        from threedgrut_tpu.playground.mesh import (ClusteredTriangles,
                                                    TriangleSoup,
                                                    make_box,
                                                    make_icosphere)

        meshes = [make_box((0, 0, 3), (1.0, 0.8, 0.6), material_id=0),
                  make_icosphere((1.5, 0.2, 4.0), 0.7, subdivisions=3,
                                 material_id=1),
                  make_icosphere((-1.2, -0.3, 2.5), 0.5, subdivisions=2,
                                 material_id=2)]
        dense = TriangleSoup(meshes)
        clustered = ClusteredTriangles(meshes, max_clusters=64)

        rng = np.random.default_rng(0)
        r = 300
        ro = rng.uniform(-0.5, 0.5, (r, 3)).astype(np.float32)
        ro[:, 2] = -2.0
        rd = rng.normal(size=(r, 3)).astype(np.float32)
        rd[:, 2] = np.abs(rd[:, 2]) + 1.5
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)

        t_d, tri_d, n_d, m_d, _uvd = dense.closest_hit(jnp.asarray(ro),
                                                 jnp.asarray(rd))
        t_c, tri_c, n_c, m_c, _uvc = clustered.closest_hit(jnp.asarray(ro),
                                                     jnp.asarray(rd))
        # budget >= cluster count -> exact agreement
        assert clustered.max_clusters == clustered.num_clusters \
            or clustered.num_clusters > 64
        np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_d),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(m_c), np.asarray(m_d))
        hit = np.asarray(m_d) >= 0
        np.testing.assert_allclose(np.asarray(n_c)[hit],
                                   np.asarray(n_d)[hit], atol=1e-5)

    def test_budgeted_culling_still_finds_near_hits(self):
        import jax.numpy as jnp

        from threedgrut_tpu.playground.mesh import (ClusteredTriangles,
                                                    make_icosphere)

        # many spheres along +z; small cluster budget must still find the
        # nearest surface for straight-ahead rays
        meshes = [make_icosphere((0, 0, 2.0 + 1.5 * i), 0.4,
                                 subdivisions=3, material_id=i)
                  for i in range(8)]
        clustered = ClusteredTriangles(meshes, max_clusters=8)
        assert clustered.max_clusters < clustered.num_clusters
        ro = np.zeros((64, 3), np.float32)
        rd = np.zeros((64, 3), np.float32)
        rd[:, 2] = 1.0
        ro[:, 0] = np.linspace(-0.3, 0.3, 64)
        t, tri, n, m, _uv2 = clustered.closest_hit(jnp.asarray(ro),
                                             jnp.asarray(rd))
        t, m = np.asarray(t), np.asarray(m)
        # the near-cluster priority guarantees: every reported hit is on
        # the NEAREST sphere (no far sphere leaks through), and the rays
        # whose clusters fit the budget (center of the block) do hit
        hit = m >= 0
        assert hit.any()
        assert (m[hit] == 0).all()
        assert (t[hit] >= 1.5).all() and (t[hit] <= 2.5).all()  # sphere 0
        assert hit[24:40].all()  # central rays always within budget
        # central rays pass through the sphere-0 front: exact distance
        np.testing.assert_allclose(t[24:40], 1.6, atol=0.12)


def write_textured_glb(path):
    """Quad with TEXCOORD_0 + a 2x2 embedded PNG baseColorTexture.

    Mirrors the reference's textured-asset semantics
    (threedgrut_playground/utils/mesh_io.py:44-112: material load +
    diffuse texture upload; engine.py:101-131: per-hit texture sample).
    """
    import json
    import struct
    import zlib

    def png_rgb(px):
        """Minimal RGB8 PNG encoder for a [H, W, 3] uint8 array."""
        h, w = px.shape[:2]
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

        def chunk(tag, data):
            c = tag + data
            return (struct.pack(">I", len(data)) + c
                    + struct.pack(">I", zlib.crc32(c)))

        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2,
                                             0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    # left half red, right half green
    tex = np.zeros((2, 2, 3), np.uint8)
    tex[:, 0] = (255, 0, 0)
    tex[:, 1] = (0, 255, 0)
    png = png_rgb(tex)
    png += b"\x00" * (-len(png) % 4)

    verts = np.asarray([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                       np.float32)
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)
    vb, ub, ib = verts.tobytes(), uvs.tobytes(), faces.tobytes() + b"\x00\x00"
    off_u, off_i, off_png = len(vb), len(vb) + len(ub), (len(vb) + len(ub)
                                                         + len(ib))
    gltf = {
        "asset": {"version": "2.0"}, "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0, 0, 4]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
            "baseColorTexture": {"index": 0},
            "metallicFactor": 0.0, "roughnessFactor": 0.5}}],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 3, "mimeType": "image/png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(vb)},
            {"buffer": 0, "byteOffset": off_u, "byteLength": len(ub)},
            {"buffer": 0, "byteOffset": off_i,
             "byteLength": len(faces.tobytes())},
            {"buffer": 0, "byteOffset": off_png, "byteLength": len(png)}],
        "buffers": [{"byteLength": off_png + len(png)}],
    }
    jchunk = json.dumps(gltf).encode()
    jchunk += b" " * (-len(jchunk) % 4)
    bchunk = vb + ub + ib + png
    body = (struct.pack("<II", len(jchunk), 0x4E4F534A) + jchunk
            + struct.pack("<II", len(bchunk), 0x004E4942) + bchunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<4sII", b"glTF", 2, 12 + len(body)) + body)


class TestTextures:
    def _native_decoder_available(self):
        try:
            from threedgrut_tpu.data.native_loader import decode_image_bytes
            return decode_image_bytes(b"") is None or True
        except Exception:
            return False

    def test_glb_scene_parses_uvs_and_material(self, tmp_path):
        from threedgrut_tpu.playground.mesh import load_glb_scene
        p = str(tmp_path / "tex.glb")
        write_textured_glb(p)
        meshes, mats = load_glb_scene(p)
        assert len(meshes) == 1 and len(mats) == 1
        assert meshes[0].uvs is not None and meshes[0].uvs.shape == (4, 2)
        assert mats[0]["roughness"] == 0.5
        # texture decode requires the native libpng decoder
        if mats[0]["diffuse_map"] is not None:
            tex = np.asarray(mats[0]["diffuse_map"])
            assert tex.shape[0] == 2 and tex.shape[1] == 2
            assert tex[0, 0, 0] > 0.9 and tex[0, 0, 1] < 0.1  # red
            assert tex[0, 1, 1] > 0.9 and tex[0, 1, 0] < 0.1  # green

    def test_textured_render_samples_map(self, tmp_path):
        """A camera looking at the textured quad sees red on the left
        half and green on the right (engine.py:101-131 semantics)."""
        from threedgrut_tpu.playground.mesh import load_glb_scene
        p = str(tmp_path / "tex.glb")
        write_textured_glb(p)
        meshes, mats = load_glb_scene(p)
        if mats[0]["diffuse_map"] is None:
            pytest.skip("native image decoder unavailable")
        _, model = make_test_scene(n=1, capacity=16, seed=0, res=(8, 8))
        # deactivate the gaussians: mesh-only image
        model = model.replace(n_active=jnp.asarray(0, jnp.int32))
        eng = Engine3DGRUT(model, EngineConfig(max_bounces=1,
                                               use_envmap=True),
                           envmap=EnvironmentMap(constant=(1.0, 1.0, 1.0)))
        eng.add_glb(p, kind="diffuse")
        # orthographic-ish probe rays straight at the quad at z=4
        xs = np.asarray([-0.5, 0.5], np.float32)    # left / right half
        ro = np.stack([np.stack([x, np.float32(0.0),
                                 np.float32(0.0)]) for x in xs])
        rd = np.tile(np.asarray([[0, 0, 1]], np.float32), (2, 1))
        rgb = np.asarray(eng.render_rays(jnp.asarray(ro), jnp.asarray(rd)))
        # left ray: red texel dominates; right: green
        assert rgb[0, 0] > rgb[0, 1] * 2, rgb
        assert rgb[1, 1] > rgb[1, 0] * 2, rgb

    def test_untextured_materials_unchanged(self):
        """Constant-factor materials render identically with the texture
        plumbing in place (no atlas built)."""
        _, model = make_test_scene(n=1, capacity=16, seed=0, res=(8, 8))
        model = model.replace(n_active=jnp.asarray(0, jnp.int32))
        eng = Engine3DGRUT(model, EngineConfig(max_bounces=1),
                           envmap=EnvironmentMap(constant=(1.0, 1.0, 1.0)))
        eng.add_primitive(make_box((0, 0, 4), 2.0),
                          PBRMaterial(kind="diffuse",
                                      base_color=(0.2, 0.4, 0.8)))
        mats = eng._material_arrays()
        assert "diffuse_map" not in mats
        ro = jnp.asarray([[0.0, 0.0, 0.0]])
        rd = jnp.asarray([[0.0, 0.0, 1.0]])
        rgb = np.asarray(eng.render_rays(ro, rd))[0]
        assert rgb[2] > rgb[0]  # blue-ish box
