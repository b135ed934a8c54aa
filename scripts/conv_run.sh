#!/bin/bash
# Full-protocol 30k convergence runs on the generated synthetic scene.
# Usage:
#   bash scripts/conv_run.sh gs     # GS densify/prune/reset protocol
#   bash scripts/conv_run.sh mcmc   # MCMC + SelectiveAdam protocol
#   bash scripts/conv_run.sh nht    # MCMC + NHT feature decoder
#   bash scripts/conv_run.sh grt    # 3DGRT sorted-compositing protocol
# Pair budget is PINNED (auto_max_pairs=false): on a cold compile cache
# every budget recalibration would swap in a freshly-compiled group
# program (minutes each through the remote compile service).
set -u
MODE=${1:-gs}
TAG=${2:-r4}
cd /root/repo
EXTRA=""
case "$MODE" in
  gs)
    APP=apps/nerf_synthetic_3dgut ;;
  mcmc)
    APP=apps/nerf_synthetic_3dgut_mcmc
    # cap MCMC capacity at bench scale (default add.max_n_gaussians=1M
    # would statically allocate a 1M-capacity model)
    EXTRA="strategy.add.max_n_gaussians=100000" ;;
  nht)
    APP=apps/nerf_synthetic_3dgut_mcmc_nht
    EXTRA="strategy.add.max_n_gaussians=100000" ;;
  grt)
    APP=apps/nerf_synthetic_3dgrt ;;
  *)
    echo "unknown mode $MODE"; exit 2 ;;
esac
exec python train.py --config-name "$APP" path=runs/synth_lego \
  out_dir=runs experiment_name=conv_${MODE}_${TAG} \
  render.max_pairs=786432 render.auto_max_pairs=false \
  checkpoint.frequency=2000 val_frequency=2000 \
  initialization.num_gaussians=30000 model.print_stats=true \
  ${EXTRA:-}
