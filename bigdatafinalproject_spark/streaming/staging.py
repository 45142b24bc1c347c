"""Deterministic multi-batch file staging for streaming tests/queries.

One parameterized chunk stager for every table-delta file stream
(r10 review: the embeddings and dedup maintenance paths had carried
near-verbatim copies of the same tempdir/tag/_STAGED/tmp-rename logic,
so a fix to the publish race or the tag identity had to be replicated
per copy). The earlier cdc/sketches stagers predate this module and
keep their local forms; new stagers should come here.

The cache TAG records the FULL identity of what was staged — source
path + mtime, label, the split/chunk rule (``identity``), and the
chunk count — so editing the delta predicate in code can never
silently serve a stale staged dir from a prior definition (the
full-identity-in-the-tag lesson the chunk stagers and
corpus_fingerprint both learned earlier; r10 review re-flagged the
dedup copy for omitting the rule identity).
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Callable

from bigdatafinalproject_spark.catalog import table_path


def chunked_delta_dir(
    sf_dir: str,
    table: str,
    key_col: str,
    label: str,
    mask_fn: Callable,
    chunk_fn: Callable,
    identity: str,
    n_chunks: int = 3,
) -> str:
    """Stage ``table``'s delta rows (``mask_fn`` over the key column)
    as ``n_chunks`` flat parquet files named chunk<i>.parquet —
    pyarrow-written, content-keyed dir, atomic publish (tmp + rename;
    the _STAGED marker commits the dir). ``chunk_fn`` maps the masked
    keys to chunk indexes (deterministic, so replaying chunk 0 through
    a live append path re-delivers exactly the original batch).
    ``identity`` must spell out the split/chunk rule (e.g. the
    predicate string) — it is part of the cache tag."""
    import tempfile

    import pyarrow.parquet as pq

    src = os.path.abspath(table_path(sf_dir, table))
    tag = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}|{label}|{identity}|{n_chunks}".encode()
    ).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"bdfp_{label}_{tag}")
    if os.path.exists(os.path.join(d, "_STAGED")):
        return d
    t = pq.read_table(src)
    keys = t.column(key_col).to_numpy()
    mask = mask_fn(keys)
    delta = t.filter(mask)
    chunk_of = chunk_fn(keys[mask])
    tmp = d + f".tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    for c in range(n_chunks):
        pq.write_table(
            delta.filter(chunk_of == c),
            os.path.join(tmp, f"chunk{c}.parquet"),
        )
    open(os.path.join(tmp, "_STAGED"), "w").write(f"{src}|{identity}")
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        # the rename loses only to a concurrent publisher of the SAME
        # content-keyed dir; any other failure (cross-device tempdir,
        # permissions) must surface HERE, not as a missing-path error
        # in the caller's readStream far from the cause (r10 advice)
        if not os.path.exists(os.path.join(d, "_STAGED")):
            raise
    return d
