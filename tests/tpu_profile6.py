"""Component timing v6: binning sub-step breakdown + batched SSIM.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tests/tpu_profile6.py
"""
import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np
from tpu_smoke import build
from threedgrut_tpu.ops import binning as binning_ops, ut as ut_ops
from threedgrut_tpu.ops.pallas.fill import segmented_fill_rows
from threedgrut_tpu.ops.ut import UTConfig, TILE_X, TILE_Y, tile_min_power_response
from threedgrut_tpu.render.common import RasterConfig


def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)
    return out


def main():
    n, side = 100_000, 800
    cam, model = build(n, (side, side))
    ut_cfg = UTConfig(); MP = 1 << 20
    gx = (side + 15) // 16; grid = (gx, gx)

    proj = jax.jit(lambda p: ut_ops.unscented_projection(
        cam, ut_cfg, p.positions, p.rotation, jnp.exp(p.scale),
        jax.nn.sigmoid(p.density)[:, 0],
        jnp.arange(p.positions.shape[0]) < n))(model.params)
    jax.block_until_ready(proj)

    bench("binning TOTAL", lambda pr: binning_ops.bin_particles(
        pr, grid, MP, chunk=128), proj)

    # --- sub-steps -------------------------------------------------------
    inv_tx, inv_ty = 1.0 / TILE_X, 1.0 / TILE_Y

    def steps_pre(pr):
        lo_x = jnp.clip(jnp.floor((pr.center[:, 0] - 0.5 - pr.extent[:, 0]) * inv_tx), 0, gx)
        lo_y = jnp.clip(jnp.floor((pr.center[:, 1] - 0.5 - pr.extent[:, 1]) * inv_ty), 0, gx)
        hi_x = jnp.clip(jnp.ceil((pr.center[:, 0] - 0.5 + pr.extent[:, 0]) * inv_tx), 0, gx)
        hi_y = jnp.clip(jnp.ceil((pr.center[:, 1] - 0.5 + pr.extent[:, 1]) * inv_ty), 0, gx)
        width = jnp.maximum(hi_x - lo_x, 0.0)
        counts = jnp.where(pr.valid, width * jnp.maximum(hi_y - lo_y, 0.0), 0.0).astype(jnp.int32)
        depth_key = jnp.where(pr.valid, pr.depth, jnp.inf)
        order = jnp.argsort(depth_key)
        counts_sorted = counts[order]
        offsets = jnp.cumsum(counts_sorted)
        excl = (offsets - counts_sorted).astype(jnp.int32)
        max_power = jnp.log(jnp.maximum(pr.opacity, 1e-30) / (1.0 / 255.0))
        per_particle = jnp.stack([
            lo_x[order], lo_y[order], width[order], excl.astype(jnp.float32),
            order.astype(jnp.float32),
            pr.conic[order, 0], pr.conic[order, 1], pr.conic[order, 2],
            pr.center[order, 0], pr.center[order, 1], max_power[order]], axis=1)
        nonempty = counts_sorted > 0
        start_slot = jnp.where(nonempty, excl, MP)
        return per_particle, start_slot, offsets[-1]

    pp, ss, total = bench("  pre (bbox+argsortN+stack)", steps_pre, proj)

    vals = bench("  fill kernel 1Mx11", lambda a, b: segmented_fill_rows(
        a, b, MP), pp, ss)

    def steps_decode(vals, total):
        pair_j = jnp.arange(MP, dtype=jnp.int32)
        in_range = pair_j < jnp.minimum(total, MP)
        rank = pair_j.astype(jnp.float32) - vals[:, 3]
        w_src = jnp.maximum(vals[:, 2], 1.0)
        ry = jnp.floor(rank / w_src)
        rx = rank - ry * w_src
        tx = vals[:, 0] + rx
        ty = vals[:, 1] + ry
        pair_particle = vals[:, 4].astype(jnp.int32)
        tile_xy = jnp.stack([tx, ty], axis=-1)
        power = tile_min_power_response(tile_xy, vals[:, 5:8], None, vals[:, 8:10])
        keep = power < vals[:, 10]
        pair_tile = jnp.where(in_range & keep,
                              (ty * gx + tx).astype(jnp.int32), gx * gx)
        return pair_tile, pair_particle

    pt, ppart = bench("  decode+cull 1M", steps_decode, vals, total)

    bench("  stable sort 1M (k+1 payload)", lambda a, b: jax.lax.sort(
        (a, b), num_keys=1, is_stable=True), pt, ppart)
    bench("  searchsorted 2.5k", lambda a: jnp.searchsorted(
        a, jnp.arange(gx * gx + 1, dtype=jnp.int32), side="left"), pt)

    # SSIM after batching
    from threedgrut_tpu.ops.ssim import ssim
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (1, 3, side, side)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (1, 3, side, side)).astype(np.float32))
    bench("ssim fwd 800px", ssim, a, b)
    bench("ssim fwd+bwd 800px", lambda x, y: jax.grad(
        lambda u: ssim(u, y))(x), a, b)


if __name__ == "__main__":
    main()
