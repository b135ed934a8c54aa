"""Headline benchmark: 3DGUT training iterations/sec on one TPU chip.

Synthetic lego-class workload (no datasets ship with this environment):
100k Gaussians, 800x800 render, full train step = render forward +
L1+DSSIM loss + backward through the Pallas kernels + masked Adam update.
Baseline anchor: reference 3DGUT GS unsorted trains NeRF-Synthetic lego in
221.7 s / 30k iters ~= 135 it/s on an RTX 5090 (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IT_S = 135.0  # reference lego 3DGUT GS unsorted on RTX 5090


def wait_for_tpu(max_wait_s=900, probe_timeout_s=240):
    """Ride out transient TPU-tunnel outages before the workload.

    Backend init is attempted in a subprocess (it can hang indefinitely
    when the axon relay is down, and a hung init poisons the parent's
    backend cache), retrying until the budget runs out. Returns silently
    on success; on exhaustion lets the main workload raise naturally.
    """
    import subprocess
    deadline = time.time() + max_wait_s
    probe = ("import jax; "
             "assert any('tpu' in str(d).lower() or 'TPU' in str(d)"
             " for d in jax.devices())")
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=probe_timeout_s,
                               capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return
        time.sleep(30)


def oracle_parity_db(model, ut_cfg, rc):
    """On-chip Pallas-vs-pure-JAX forward parity, in dB PSNR.

    The CPU test suite executes every precision as f32 and is therefore
    structurally blind to Mosaic MXU-lowering regressions (the round-4
    bf16 dot_general bug rendered at 34.6 dB parity on chip while every
    CPU oracle test stayed green). This probe renders ONE 200x200 frame
    of the bench cloud (first 60k particles) through both paths on the
    real device and reports -10*log10(MSE); healthy is >= 100 dB.

    Returns ``(bulk_db, raw_db, flip_frac)``. The headline ``bulk_db``
    is measured over pixels where both paths agree on the accepted-hit
    count: a ~1e-7 response difference at the ``min_response`` /
    ``min_alpha`` acceptance boundary adds or drops one minimum-alpha
    (~1/255) contribution on isolated pixels — an inherent epsilon
    floor of ANY independent reimplementation (caps raw PSNR near
    ~87 dB on this scene, tools/parity_probe.py), orthogonal to the
    bulk bf16-lowering noise class this probe exists to catch. A
    lowering regression shows up in ``bulk_db`` (all pixels, small
    error) AND blows up ``flip_frac``; both are printed.
    """
    from threedgrut_tpu.models.gaussians import GaussianState
    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.render.gut import render_gut
    from threedgrut_tpu.render.oracle import render_oracle

    side, n, cap = 200, 60_000, 60_160  # cap multiple of 256
    small = GaussianState(
        params=jax.tree.map(lambda x: x[:cap], model.params),
        n_active=jnp.asarray(n, jnp.int32),
        n_active_features=model.n_active_features,
        config=model.config)
    # exact_kill: the oracle implements the reference's exact kill
    # semantics; the bench's relaxed-kill residual (<2e-3/channel,
    # quality-equivalent) would otherwise cap the probe near ~87 dB and
    # mask genuine lowering regressions below it.
    rc = rc.replace(exact_kill=True)
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    got = render_gut(cam, ut_cfg, rc, small, sh_degree=3)
    ref = render_oracle(cam, ut_cfg, rc, small, sh_degree=3)
    err = np.abs(np.asarray(got["pred_features"]) -
                 np.asarray(ref["pred_features"]))          # [H, W, 3]

    def db(mse):
        return 999.0 if mse <= 0.0 else round(-10.0 * np.log10(mse), 1)

    # pixels whose worst-channel error reaches half a minimum-alpha
    # contribution made a different discrete acceptance decision
    # somewhere in their hit list; everything below is continuous
    # accumulation error (PSNR over per-channel MSE). A bf16 lowering
    # regression (~2e-3 relative on O(1) radiance) lands above the
    # threshold on nearly every covered pixel -> flip_frac ~ 1 AND
    # bulk collapses; measured healthy floor is ~92 dB bulk (sub-
    # threshold acceptance leakage + the MXU log-space scan's ~2^-17
    # rounding — tools/parity_probe.py table in NOTES.md round 5).
    flip = err.max(axis=-1) > (0.5 / 255.0)
    bulk = db(float(np.mean((err[~flip]) ** 2))) if (~flip).any() else 0.0
    return bulk, db(float(np.mean(err ** 2))), round(float(flip.mean()), 5)


def main():
    from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                 GaussianParams,
                                                 GaussianState)
    from threedgrut_tpu.ops.cameras import make_pinhole
    from threedgrut_tpu.ops.sh import rgb_to_sh0
    from threedgrut_tpu.ops.ssim import ssim
    from threedgrut_tpu.ops.ut import UTConfig
    from threedgrut_tpu.optimizers.adam import adam_step, init_adam_state
    from threedgrut_tpu.render.common import RasterConfig
    from threedgrut_tpu.render.gut import render_gut

    n, side, cap = 100_000, 800, 100_352  # cap = multiple of 256
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
    cam = make_pinhole(resolution=(side, side),
                       focal=(1.1 * side, 1.1 * side),
                       principal=(side / 2, side / 2))
    ut_cfg = UTConfig()
    # total pre-cull pairs 690,641 for this scene (+2%). Relaxed
    # transmittance-kill adopted from the round-2 on-chip A/B
    # (tests/tpu_profile15.py); records_bf16 REJECTED in round 3 — the
    # bf16 geometry rounding cost ~5 dB on the 30k convergence protocol
    # (configs/render/3dgut.yaml rationale), so benching with it would
    # claim speed from a setting real training can't use.
    rc = RasterConfig(max_pairs=86 * 8192, records_bf16=False,
                      exact_kill=False)
    gt = jnp.asarray(rng.uniform(0, 1, (side, side, 3)).astype(np.float32))
    opt_state = init_adam_state(params_d)
    lrs = {k: jnp.asarray(1e-3, jnp.float32) for k in params_d}

    def train_step(params_d, opt_state):
        def loss_fn(pd):
            m = model.replace(params=model.params.replace(**pd))
            out = render_gut(cam, ut_cfg, rc, m, sh_degree=3)
            pred = out["pred_features"]
            l1 = jnp.mean(jnp.abs(pred - gt))
            s = ssim(pred.transpose(2, 0, 1)[None],
                     gt.transpose(2, 0, 1)[None])
            return 0.8 * l1 + 0.2 * (1.0 - s)
        loss, grads = jax.value_and_grad(loss_fn)(params_d)
        active = jnp.arange(cap, dtype=jnp.int32) < model.n_active
        new_p, new_o = adam_step(params_d, grads, opt_state, lrs,
                                 update_mask=active)
        return new_p, new_o, loss

    steps_per_call = 10

    @jax.jit
    def train_many(params_d, opt_state):
        def body(_, carry):
            p, o, _ = carry
            return train_step(p, o)
        return jax.lax.fori_loop(
            0, steps_per_call, body,
            (params_d, opt_state, jnp.asarray(0.0)))

    # warmup / compile
    params_d, opt_state, loss = train_many(params_d, opt_state)
    jax.block_until_ready(loss)

    calls = 4
    t0 = time.time()
    for _ in range(calls):
        params_d, opt_state, loss = train_many(params_d, opt_state)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / (calls * steps_per_call)
    it_s = 1.0 / dt

    parity, parity_raw, flips = oracle_parity_db(model, ut_cfg, rc)

    print(json.dumps({
        "metric": "3dgut_train_iters_per_sec_100k_800px",
        "value": round(it_s, 2),
        "unit": "it/s",
        "vs_baseline": round(it_s / BASELINE_IT_S, 4),
        "oracle_parity_db": parity,
        "oracle_parity_raw_db": parity_raw,
        "oracle_flip_frac": flips,
    }))


if __name__ == "__main__":
    wait_for_tpu()
    main()
