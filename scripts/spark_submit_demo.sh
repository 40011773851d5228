#!/usr/bin/env bash
# Literal `spark-submit --py-files` demonstration of the north rule's deploy
# story: package wise_spark into a zip, submit the CLI as the application
# script against a master, build an index over a parquet corpus, and run one
# search against it. The in-repo scaling protocol (bench.py / cluster.py)
# uses the programmatic equivalent (deploy.package_zip + sc.addPyFile) so it
# can pin executors per CPU; this script proves the same artifact works under
# plain spark-submit, driven from a scratch CWD so nothing resolves via the
# repo checkout.
#
# Usage: scripts/spark_submit_demo.sh [master] [input_parquet]
#   master          default local[4]   (spark://host:port for a real cluster)
#   input_parquet   default /root/testdata/sf0.001/documents.parquet
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[4]}"
INPUT="${2:-/root/testdata/sf0.001/documents.parquet}"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

PYFILES="$WORK/wise_spark_pkg.zip"
python - "$REPO" "$PYFILES" <<'EOF'
import sys
sys.path.insert(0, sys.argv[1])
from wise_spark.deploy import package_zip
print(package_zip(sys.argv[2]))
EOF

# The application script is a 3-line wrapper: spark-submit needs a file
# path for the app, and the wise_spark package itself (including the CLI's
# relative imports) must resolve from the --py-files zip on both driver and
# executors — extracting cli.py out of its package would break those
# relative imports.
cat > "$WORK/cli_app.py" <<'EOF'
from wise_spark.cli import main
raise SystemExit(main())
EOF

SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
INDEX="$WORK/index"

cd "$WORK"   # scratch CWD: imports must come from --py-files, not the repo
"$SUBMIT" --master "$MASTER" --py-files "$PYFILES" \
    --conf spark.sql.shuffle.partitions=8 --conf spark.ui.enabled=false \
    cli_app.py build --input "$INPUT" --index-dir "$INDEX" --text-col text
"$SUBMIT" --master "$MASTER" --py-files "$PYFILES" \
    --conf spark.ui.enabled=false \
    cli_app.py search --index-dir "$INDEX" --query "data" --topk 5
echo "spark-submit --py-files demo OK (master=$MASTER)"
