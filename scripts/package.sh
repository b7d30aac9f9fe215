#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north_rule ship vehicle).
#
#   scripts/package.sh                  # -> dist/crumble_spark.zip
#   spark-submit --py-files dist/crumble_spark.zip \
#       --conf spark.task.cpus=1 \
#       scripts/run_encode.py --input <parquet> --output <dir>
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/crumble_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/crumble_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, names in os.walk("crumble_spark"):
        if "__pycache__" in root:
            continue
        for n in sorted(names):
            if n.endswith(".py"):
                z.write(os.path.join(root, n))
print("wrote dist/crumble_spark.zip")
EOF
