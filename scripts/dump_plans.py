"""Dump .explain('formatted') for named queries to
plans/$BDFP_PLAN_ROUND/<q>_<tag>.txt (round defaults to r15).

Usage: python scripts/dump_plans.py before q1 q2 ...
Streaming/lifecycle queries whose final frame is a plain read-back still
get their serve-plan captured (the returned DataFrame's plan).
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdatafinalproject_spark import registry  # noqa: E402
from bigdatafinalproject_spark.session import get_spark  # noqa: E402

def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("BDFP_PLAN_ROUND", "r15")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="bdfp-plans")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(name, "->", out_dir / f"{name}_{tag}.txt")

if __name__ == "__main__":
    main()
