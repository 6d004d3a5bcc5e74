#!/usr/bin/env bash
# North-rule evidence: run the engine via `spark-submit --py-files` on a
# multi-executor (local-cluster) master — the deployment shape the task
# prescribes ("launched via spark-submit --py-files on multi-executor
# clusters"). Packages godal_spark as a zip, ships it to executors, and
# runs the checkpoint/resume pipeline.
#
# Usage: scripts/submit_pyfiles.sh [n_executors] [cores_per_executor]
set -euo pipefail
cd "$(dirname "$0")/.."

N_EXEC="${1:-2}"
CORES="${2:-4}"
MEM_MB=4096
OUT="${SUBMIT_OUT:-/tmp/godal_submit_out}"
ZIP=/tmp/godal_spark_pyfiles.zip

rm -rf "$OUT" "$ZIP"
python - <<PY
import zipfile, os
with zipfile.ZipFile("$ZIP", "w") as z:
    for root, _, files in os.walk("godal_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged", "$ZIP")
PY

SPARK_SUBMIT="$(python - <<'PY'
import os, pyspark
print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))
PY
)"

"$SPARK_SUBMIT" \
  --master "local-cluster[${N_EXEC},${CORES},${MEM_MB}]" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions=$((N_EXEC * CORES * 2)) \
  --conf spark.sql.adaptive.enabled=true \
  scripts/run_pipeline.py --synthetic 2000 --out "$OUT" --partitions $((N_EXEC * CORES))

echo "submit OK: $(find "$OUT" -name '*.parquet' | wc -l) parquet files in $OUT"
