"""Capture .explain('formatted') for declared queries into plans/r06/.

Usage: python scripts/capture_plans.py <repo_root> <suffix> [names...]
Writes /root/repo/plans/r06/<name>_<suffix>.txt using the code at
<repo_root> (e.g. a git worktree of the round-5 tree for 'before').
"""
from __future__ import annotations

import os
import sys

root = os.path.abspath(sys.argv[1])
suffix = sys.argv[2]
names = sys.argv[3:]
sys.path.insert(0, root)

OUT = "/root/repo/plans/r06"
os.makedirs(OUT, exist_ok=True)

from wise_spark.session import get_spark  # noqa: E402

import __spark_entry__ as E  # noqa: E402

assert E.__file__.startswith(root), E.__file__
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(master="local[8]", app_name=f"plans_{suffix}",
                  shuffle_partitions=64,
                  extra_conf={"spark.driver.memory": "16g"})
E._get_index(spark, sf_dir)
qs = E.queries()
for name in names or list(qs):
    if name not in qs:
        continue
    try:
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
    except Exception as e:  # noqa: BLE001
        plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
    with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(f"wrote {name}_{suffix}.txt", file=sys.stderr, flush=True)
spark.stop()
