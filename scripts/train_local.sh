#!/usr/bin/env bash
# Local training launch (reference: src/scripts/local_run_exp.sh, which
# started redis + master + worker tmux panes; here one SPMD process is the
# whole run). Usage: scripts/train_local.sh experiments/mscoco_nes.json [args...]
set -euo pipefail
EXP_FILE="${1:-experiments/mnist_nes.json}"
shift || true
mkdir -p output
exec python -m nes_img_captioning_tpu.main master \
    --exp_file "$EXP_FILE" --plot "$@" \
    2>&1 | tee "output/$(basename "${EXP_FILE%.json}")_$$_outputfile.txt"
