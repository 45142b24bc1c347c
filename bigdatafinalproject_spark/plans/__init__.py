"""Physical-plan inspection helpers: the `.explain("formatted")`
discipline, automatable — assert that filters push into scans, small
dims broadcast, and top-k compiles to TakeOrderedAndProject instead of
a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df).lower()
    return {n: n.lower() in plan for n in needles}
