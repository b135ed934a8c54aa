"""Multi-chip data parallelism on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    n = min(8, len(jax.devices()))
    mod.dryrun_multichip(n)


@pytest.mark.slow
def test_dp_matches_single_device():
    """Band-sharded loss/grads == unsharded loss/grads."""
    import importlib.util
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from threedgrut_tpu.optimizers.adam import init_adam_state
    from threedgrut_tpu.parallel.dp import (make_dp_train_step,
                                            replicate_to_mesh,
                                            shard_image_rows)
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.render.common import RasterConfig

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n_dev = min(4, len(jax.devices()))
    res = (32, 16 * n_dev)
    cam, model = mod._build_scene(n=128, cap=128, res=res)
    params_d = dict(positions=model.params.positions,
                    rotation=model.params.rotation,
                    scale=model.params.scale, density=model.params.density,
                    features_albedo=model.params.features_albedo,
                    features_specular=model.params.features_specular)
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (res[1], res[0], 3)).astype(np.float32))
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}

    # SSIM enabled: the halo-row ppermute exchange makes band-sharded
    # SSIM EXACT (windows crossing band boundaries are computed by the
    # center-owning band), so the full default loss must match
    mesh_multi = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    step_multi = make_dp_train_step(mesh_multi, cam, UTConfig(),
                                    RasterConfig(max_pairs=1 << 12), model,
                                    sh_degree=1, loss_lambda_ssim=0.2)
    p_m = replicate_to_mesh(mesh_multi, params_d)
    o_m = replicate_to_mesh(mesh_multi, init_adam_state(params_d))
    new_m, _, metrics_m = step_multi(p_m, o_m, lrs,
                                     shard_image_rows(mesh_multi, gt),
                                     model.n_active, cam)

    mesh_one = Mesh(np.array(jax.devices()[:1]), ("dp",))
    step_one = make_dp_train_step(mesh_one, cam, UTConfig(),
                                  RasterConfig(max_pairs=1 << 12), model,
                                  sh_degree=1, loss_lambda_ssim=0.2)
    p_1 = replicate_to_mesh(mesh_one, params_d)
    o_1 = replicate_to_mesh(mesh_one, init_adam_state(params_d))
    new_1, _, metrics_1 = step_one(p_1, o_1, lrs,
                                   shard_image_rows(mesh_one, gt),
                                   model.n_active, cam)

    np.testing.assert_allclose(float(metrics_m["total"]),
                               float(metrics_1["total"]), rtol=2e-3)
    mismatched = 0
    for k in params_d:
        a, b2 = np.asarray(new_m[k]), np.asarray(new_1[k])
        # adam's sign(grad)-scale updates amplify fp reassociation noise on
        # near-zero grads; require near-exact agreement on >99% of entries
        mismatched += int((np.abs(a - b2) > 2e-5).sum())
    total = sum(np.asarray(v).size for v in params_d.values())
    assert mismatched / total < 0.01, f"{mismatched}/{total} diverged" 


@pytest.mark.slow
def test_depth_sliced_matches_single_device():
    """Particle (depth-slab) sharding: combined render == single chip."""
    import importlib.util
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.parallel.dp import replicate_to_mesh
    from threedgrut_tpu.parallel.particle import make_sliced_render
    from threedgrut_tpu.render.gut import render_gut
    from threedgrut_tpu.render.common import RasterConfig

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n_dev = min(4, len(jax.devices()))
    cam, model = mod._build_scene(n=128, cap=128, res=(48, 32))
    params_d = dict(positions=model.params.positions,
                    rotation=model.params.rotation,
                    scale=model.params.scale, density=model.params.density,
                    features_albedo=model.params.features_albedo,
                    features_specular=model.params.features_specular)
    rc = RasterConfig(max_pairs=1 << 12)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("mp",))
    render = make_sliced_render(mesh, UTConfig(), rc, model, sh_degree=1)
    p_m = replicate_to_mesh(mesh, params_d)
    feat, opac, dist = render(p_m, model.n_active, cam)

    ref = render_gut(cam, UTConfig(), rc, model, sh_degree=1,
                     interpret=True)
    # exact up to min_transmittance kill-threshold effects (1e-4)
    np.testing.assert_allclose(np.asarray(feat), ref["pred_features"],
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(opac), ref["pred_opacity"],
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dist), ref["pred_dist"],
                               atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_depth_sliced_train_step_grads():
    """Sliced-step gradients match the single-device L1 gradients."""
    import importlib.util
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.optimizers.adam import init_adam_state
    from threedgrut_tpu.parallel.dp import replicate_to_mesh
    from threedgrut_tpu.parallel.particle import make_sliced_train_step
    from threedgrut_tpu.render.gut import render_gut
    from threedgrut_tpu.render.common import RasterConfig

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n_dev = min(4, len(jax.devices()))
    cam, model = mod._build_scene(n=96, cap=96, res=(32, 32))
    params_d = dict(positions=model.params.positions,
                    rotation=model.params.rotation,
                    scale=model.params.scale, density=model.params.density,
                    features_albedo=model.params.features_albedo,
                    features_specular=model.params.features_specular)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}
    rc = RasterConfig(max_pairs=1 << 12)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("mp",))
    step = make_sliced_train_step(mesh, UTConfig(), rc, model, sh_degree=1,
                                  lambda_l1=1.0, lambda_ssim=0.0)
    p_m = replicate_to_mesh(mesh, params_d)
    o_m = replicate_to_mesh(mesh, init_adam_state(params_d))
    _, _, metrics = step(p_m, o_m, lrs, gt, model.n_active, cam)

    def ref_loss(pd):
        m = model.replace(params=model.params.replace(**pd))
        out = render_gut(cam, UTConfig(), rc, m, sh_degree=1,
                         interpret=True)
        return jnp.mean(jnp.abs(out["pred_features"] - gt))

    np.testing.assert_allclose(float(metrics["total"]),
                               float(ref_loss(params_d)), rtol=3e-3,
                               atol=1e-4)


@pytest.mark.slow
def test_dp_x_mp_matches_single_device():
    """Combined 2D (dp x mp) step: loss matches single-device L1."""
    import importlib.util
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.optimizers.adam import init_adam_state
    from threedgrut_tpu.parallel.dp import replicate_to_mesh
    from threedgrut_tpu.parallel.particle import make_dp_sliced_train_step
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.gut import render_gut

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n_dev = min(4, len(jax.devices()))
    assert n_dev >= 4, "needs the 8-device virtual mesh conftest"
    shape = (2, 2)
    res = (32, 16 * shape[0])
    cam, model = mod._build_scene(n=96, cap=96, res=res)
    params_d = dict(positions=model.params.positions,
                    rotation=model.params.rotation,
                    scale=model.params.scale, density=model.params.density,
                    features_albedo=model.params.features_albedo,
                    features_specular=model.params.features_specular)
    rng = np.random.default_rng(2)
    gt = jnp.asarray(rng.uniform(0, 1,
                                 (res[1], res[0], 3)).astype(np.float32))
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}
    rc = RasterConfig(max_pairs=1 << 12)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(shape), ("dp", "mp"))
    step = make_dp_sliced_train_step(mesh, cam, UTConfig(), rc, model,
                                     sh_degree=1)
    p_m = replicate_to_mesh(mesh, params_d)
    o_m = replicate_to_mesh(mesh, init_adam_state(params_d))
    gt_s = jax.device_put(gt, NamedSharding(mesh, P("dp", None, None)))
    _, _, metrics = step(p_m, o_m, lrs, gt_s, model.n_active, cam)

    def ref_loss(pd):
        m = model.replace(params=model.params.replace(**pd))
        out = render_gut(cam, UTConfig(), rc, m, sh_degree=1,
                         interpret=True)
        return jnp.mean(jnp.abs(out["pred_features"] - gt))

    np.testing.assert_allclose(float(metrics["total"]),
                               float(ref_loss(params_d)), rtol=3e-3,
                               atol=1e-4)
