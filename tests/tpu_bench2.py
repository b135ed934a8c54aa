"""TPU measurement: new suffix-sum/hand-VJP backward + grad_fold route.

Runs the bench.py workload (100k gaussians, 800x800, 10-step dispatch)
in three configurations inside one process (compiles serialize through
the remote service; batching them amortizes session setup):

  A. scatter route (grad_fold=False)  - new backward kernel baseline
  B. fold route    (grad_fold=True)
  C. micro: argsort(perm) / 768k x 16 row gather / fold kernel alone

Run: python tests/tpu_bench2.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def make_state():
    from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                 GaussianParams,
                                                 GaussianState)
    from threedgrut_tpu.ops.sh import rgb_to_sh0

    n, cap = 100_000, 100_352
    rng = np.random.default_rng(0)
    pos = np.zeros((cap, 3), np.float32)
    pos[:n, 0:2] = rng.uniform(-2.5, 2.5, (n, 2))
    pos[:n, 2] = rng.uniform(2.0, 9.0, n)
    pos[n:, 2] = 1e6
    quat = rng.normal(size=(cap, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    scales = np.log(rng.uniform(0.01, 0.05, (cap, 3)).astype(np.float32))
    dens = (rng.normal(size=(cap, 1)) * 0.5).astype(np.float32)
    albedo = np.asarray(rgb_to_sh0(jnp.asarray(
        rng.uniform(0, 1, (cap, 3)).astype(np.float32))))
    spec = (rng.normal(size=(cap, 45)) * 0.02).astype(np.float32)
    params_d = dict(
        positions=jnp.asarray(pos), rotation=jnp.asarray(quat),
        scale=jnp.asarray(scales), density=jnp.asarray(dens),
        features_albedo=jnp.asarray(albedo),
        features_specular=jnp.asarray(spec))
    model = GaussianState(
        params=GaussianParams(**params_d),
        n_active=jnp.asarray(n, jnp.int32),
        n_active_features=jnp.asarray(3, jnp.int32),
        config=GaussianModelConfig())
    return params_d, model


def bench_train(params_d, model, grad_fold):
    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.ops.ssim import ssim
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.optimizers.adam import adam_step, init_adam_state
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.gut import render_gut

    side, cap = 800, 100_352
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    ut_cfg = UTConfig()
    rc = RasterConfig(max_pairs=768 * 1024, grad_fold=grad_fold)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (side, side, 3)).astype(np.float32))
    opt_state = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}

    def train_step(pd, opt):
        def loss_fn(pdd):
            m = model.replace(params=model.params.replace(**pdd))
            out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
            pred = out["pred_features"]
            l1 = jnp.mean(jnp.abs(pred - gt))
            s = ssim(pred.transpose(2, 0, 1)[None],
                     gt.transpose(2, 0, 1)[None])
            return 0.8 * l1 + 0.2 * (1.0 - s)
        loss, grads = jax.value_and_grad(loss_fn)(pd)
        active = jnp.arange(cap, dtype=jnp.int32) < model.n_active
        np_, no_ = adam_step(pd, grads, opt, lrs, update_mask=active)
        return np_, no_, loss

    @jax.jit
    def train_many(pd, opt):
        def body(_, carry):
            p, o, _ = carry
            return train_step(p, o)
        return jax.lax.fori_loop(0, 10, body,
                                 (pd, opt, jnp.asarray(0.0)))

    t0 = time.time()
    pd, opt, loss = train_many(params_d, opt_state)
    jax.block_until_ready(loss)
    print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
    calls = 4
    t0 = time.time()
    for _ in range(calls):
        pd, opt, loss = train_many(pd, opt)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / (calls * 10)
    return 1.0 / dt


def micro():
    from threedgrut_tpu.ops.pallas.fold import fold_sorted_intervals

    p, cap, r = 768 * 1024, 100_352, 16
    rng = np.random.default_rng(0)
    seg = np.sort(rng.integers(0, cap, p)).astype(np.int32)
    counts = np.bincount(seg, minlength=cap)
    nxt = np.cumsum(counts).astype(np.int32)
    slot = (nxt - counts).astype(np.int32)
    rank = np.repeat(np.arange(cap), counts).astype(np.float32)
    perm = rng.permutation(p).astype(np.int32)
    d_rows = (rng.normal(size=(p, r)) * 1e-3).astype(np.float32)
    pm, dr = jnp.asarray(perm), jnp.asarray(d_rows)
    rk = jnp.asarray(rank)
    st, en = jnp.asarray(slot), jnp.asarray(nxt)

    def t(name, fn, *args, n=10):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        print(f"  {name}: {(time.time()-t0)/n*1000:.2f} ms", flush=True)

    t("argsort 768k i32", lambda x: jnp.argsort(x), pm)
    inv = jnp.argsort(pm)
    t("row gather 768k x16", lambda d: d[inv], dr)
    t("fold kernel 768k->100k", lambda d: fold_sorted_intervals(
        d, rk, st, en), dr)
    t("full fold route", lambda d: fold_sorted_intervals(
        d[jnp.argsort(pm)], rk, st, en)[jnp.argsort(
            jnp.asarray(np.arange(cap, dtype=np.int32)))], dr)
    t("scatter-add dup (ref)", lambda d: jnp.zeros(
        (cap, r), jnp.float32).at[jnp.asarray(seg[perm])].add(d), dr)


def main():
    print("devices:", jax.devices(), flush=True)
    params_d, model = make_state()
    print("A. scatter route (new bwd):", flush=True)
    a = bench_train(params_d, model, grad_fold=False)
    print(f"  -> {a:.2f} it/s", flush=True)
    print("B. fold route:", flush=True)
    b = bench_train(params_d, model, grad_fold=True)
    print(f"  -> {b:.2f} it/s", flush=True)
    print("C. micro:", flush=True)
    micro()
    print(json.dumps({"scatter_its": round(a, 2),
                      "fold_its": round(b, 2)}))


if __name__ == "__main__":
    main()
