#!/usr/bin/env bash
# One-command real-corpus parity gate: drop the reference's
# train_new.json / test_new.json into <dir> and run
#   scripts/replay.sh <dir> [replay_gate.py args...]
# Packages the engine and spark-submits scripts/replay_gate.py
# (features -> graphs -> train -> predict -> tune -> M10 P/R/F1).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${SPARK_MASTER:-local[16]}"
mkdir -p "$REPO/dist"
ZIP="$REPO/dist/usc_ds_relationextraction_spark.zip"
(cd "$REPO" && python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/usc_ds_relationextraction_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("usc_ds_relationextraction_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF
)
exec spark-submit --master "$MASTER" --py-files "$ZIP" \
  "$REPO/scripts/replay_gate.py" "$@"
