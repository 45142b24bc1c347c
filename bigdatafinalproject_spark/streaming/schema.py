"""Footer-derived readStream schemas + canonical casts.

The round-2 emergency was a testdata regeneration flipping events.ts's
physical type under a HARD-CODED streaming schema (batch reads infer
from the footer; streaming reads trust the caller). Rule since: every
streaming reader derives its READ schema from the parquet footer of
the current file, then CASTS to the engine's canonical column types —
physical drift (int32 vs int64, float vs double) is absorbed at the
boundary instead of crashing the source or silently nulling columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def footer_read_schema(parquet_path: str) -> T.StructType:
    """Spark StructType matching the file's ACTUAL physical/arrow
    schema (what a batch read would infer)."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_type

    arrow = pq.ParquetFile(parquet_path).schema_arrow
    return T.StructType(
        [
            T.StructField(f.name, from_arrow_type(f.type), f.nullable)
            for f in arrow
        ]
    )


def cast_to_canonical(df: DataFrame, canonical: T.StructType) -> DataFrame:
    """Cast every column whose loaded type differs from the canonical
    schema (no-op projection when nothing drifted).

    Raises ValueError naming the missing columns if a regeneration
    dropped or renamed one — the drift class a bare KeyError would turn
    into an opaque crash (ADVICE r3)."""
    loaded = dict(zip(df.schema.names, df.schema.fields))
    missing = [f.name for f in canonical if f.name not in loaded]
    if missing:
        raise ValueError(
            f"canonical columns {missing} absent from loaded schema "
            f"{sorted(loaded)} — the source parquet no longer carries "
            "them (dropped or renamed in a testdata regeneration?)"
        )
    cols = []
    for f in canonical:
        if loaded[f.name].dataType == f.dataType:
            cols.append(F.col(f.name))
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)
