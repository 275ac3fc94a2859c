#!/usr/bin/env bash
# north_rule execution path: package the engine and run the bench via
# spark-submit --py-files (cluster-submittable artifact; locally the
# master defaults to the session's local[N]).
#
#   tools/submit_bench.sh [extra spark-submit args...]
#
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/promptner_spark.zip
rm -f "$ZIP"
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path("promptner_spark")
with zipfile.ZipFile("/tmp/promptner_spark.zip", "w") as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("packaged", "/tmp/promptner_spark.zip")
EOF

exec spark-submit \
  --py-files "$ZIP" \
  "$@" \
  bench.py
