#!/usr/bin/env bash
# Profiling launch (reference: src/scripts/local_profile_cpu_exp.sh wrapped
# master+worker in cProfile; here generation 2 is traced with jax.profiler —
# the trace lands in <log_dir>/profile, viewable with tensorboard/xprof).
# Host-side python profiling still works the classic way:
#   python -m cProfile -o output/profile_master.txt -m nes_img_captioning_tpu.main master ...
set -euo pipefail
EXP_FILE="${1:-experiments/mnist_nes.json}"
shift || true
PATCHED="$(python - "$EXP_FILE" <<'EOF'
import json, sys, tempfile
exp = json.load(open(sys.argv[1]))
exp.setdefault("tpu", {})["profile"] = True
fd, path = tempfile.mkstemp(suffix=".json")
with open(path, "w") as f:
    json.dump(exp, f)
print(path)
EOF
)"
exec python -m nes_img_captioning_tpu.main master \
    --exp_file "$PATCHED" --max_iterations "${MAX_ITERATIONS:-4}" "$@"
