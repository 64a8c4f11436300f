#!/usr/bin/env bash
# Package the engine and launch it the way the north_rule specifies:
#   spark-submit --py-files <zip> scripts/run_pipeline.py ...
# All extra args are forwarded to run_pipeline.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${SPARK_MASTER:-local[8]}"
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
  "$REPO/scripts/run_pipeline.py" "$@"
