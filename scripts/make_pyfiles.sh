#!/usr/bin/env bash
# Package the engine for cluster submission (north rule: ships as
# spark-submit --py-files modules).
#
#   ./scripts/make_pyfiles.sh
#   spark-submit --py-files dist/ocgis_spark.zip jobs/run_pipeline.py \
#       --input /data/docs --output /data/out --tdim 16
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ocgis_spark.zip
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("dist/ocgis_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("ocgis_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/ocgis_spark.zip")
EOF
