"""Deterministic scale-up of the driver's synthetic tables.

Produces an sf<M*0.1> sibling of /root/testdata/sf0.1 by offset-cloning
every table M times (copy 0 is the original, bit-for-bit), preserving:

- referential integrity — every foreign key is offset by the same
  per-copy span as its parent's primary key, so join fan-outs and
  selectivities scale exactly linearly;
- key-space density — all keys stay 0-based dense (copy i occupies
  [i*span, (i+1)*span)), which several operators rely on (dense-id
  assignment, generated negative-sampling candidates);
- dedup structure — document TEXT is word-salted per copy (every
  whitespace token gets a "~<i>" suffix), so within-copy shingle /
  MinHash / SimHash relationships are IDENTICAL to the original while
  cross-copy shingle sets are disjoint: candidate-pair volume scales
  ~M x, not quadratically (exact cloning would make every doc a 10-way
  duplicate and blow candidate pairs up ~M^2 — not a scale test, a
  different workload);
- embedding geometry — copy i applies a seeded coordinate permutation
  + sign flip (an isometry): within-copy distances and neighbor ranks
  are preserved exactly, cross-copy vectors decorrelate, so ANN
  bucket occupancy scales linearly;
- dimension tables (region, nation) stay fixed, as at any real scale.

Usage:
    python scripts/gen_scale.py [--mult 10] [--src /root/testdata/sf0.1]
                                [--dst .scaledata/sf1]

Writes one <table>.parquet per table (the sf-dir layout every query
expects). Deterministic: same inputs -> byte-stable content (modulo
parquet encoder details).
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES_SQL: dict[str, tuple[str, ...]] = {
    # table -> (key columns to offset, grouped by the span table)
    # handled generically below via OFFSETS
}

# column -> span source table (span = rowcount of that table at sf0.1)
OFFSETS = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "customer_stream",  # events.user_id has its own 0..1499 space
    "doc_id": "documents",
    "vec_id": "embeddings",
}

CLONED_TABLES = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
]
FIXED_TABLES = ["region", "nation"]


def _spans(con: duckdb.DuckDBPyConnection, src: str) -> dict[str, int]:
    spans: dict[str, int] = {}
    for t in ["customer", "supplier", "part", "orders", "events", "documents", "embeddings"]:
        spans[t] = con.execute(
            f"SELECT COUNT(*) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
    spans["customer_stream"] = (
        con.execute(
            f"SELECT MAX(user_id) + 1 FROM '{src}/events.parquet'"
        ).fetchone()[0]
    )
    return spans


def _copy_select(
    table: str, src: str, i: int, spans: dict[str, int]
) -> str:
    cols = duckdb.sql(f"SELECT * FROM '{src}/{table}.parquet' LIMIT 0").columns
    parts = []
    for c in cols:
        if c in OFFSETS:
            span = spans[OFFSETS[c]]
            parts.append(f"({c} + {i * span}) AS {c}")
        elif table == "documents" and c == "text" and i > 0:
            # word-salt: suffix every token so cross-copy shingles are
            # disjoint while within-copy similarity structure is exact
            parts.append(rf"regexp_replace(text, '(\S+)', '\1~{i}', 'g') AS text")
        elif table == "documents" and c == "n_chars":
            # n_chars == length(text) in the source data; keep the
            # invariant through the salt
            if i > 0:
                parts.append(
                    rf"length(regexp_replace(text, '(\S+)', '\1~{i}', 'g')) AS n_chars"
                )
            else:
                parts.append("n_chars")
        else:
            parts.append(c)
    return f"SELECT {', '.join(parts)} FROM '{src}/{table}.parquet'"


def gen_tabular(src: str, dst: str, mult: int) -> None:
    con = duckdb.connect()
    spans = _spans(con, src)
    for t in FIXED_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in CLONED_TABLES:
        union = "\nUNION ALL\n".join(
            _copy_select(t, src, i, spans) for i in range(mult)
        )
        con.execute(
            f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: {spans.get(t, '?')} -> x{mult}")


def gen_embeddings(src: str, dst: str, mult: int) -> None:
    t = pq.read_table(f"{src}/embeddings.parquet")
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = t.column("label").to_numpy()
    n, dim = vecs.shape
    out_vecs, out_ids, out_labels = [], [], []
    for i in range(mult):
        if i == 0:
            v = vecs
        else:
            rng = np.random.RandomState(9000 + i)
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            v = vecs[:, perm] * signs  # isometry: ranks/distances preserved
        out_vecs.append(v)
        out_ids.append(np.arange(n, dtype=np.int64) + i * n)
        out_labels.append(labels)
    allv = np.concatenate(out_vecs)
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids)),
            "embedding": pa.array(
                [row for row in allv], type=pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(out_labels), type=pa.int32()),
        }
    )
    pq.write_table(table, f"{dst}/embeddings.parquet")
    print(f"embeddings: {n} -> x{mult}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--dst",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaledata",
            "sf1",
        ),
    )
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    gen_tabular(args.src, args.dst, args.mult)
    gen_embeddings(args.src, args.dst, args.mult)
    print("done:", args.dst)


if __name__ == "__main__":
    main()
