#!/usr/bin/env python3
"""Build higher-SF probe fixtures for the knee probe (VERDICT r7 ask #6).

SCALE.md's own reading of the slope table is that every curve is still
scheduler-dominated at sf0.1 — the slopes prove absence of
super-linearity only below the data-bound regime. This tool
manufactures sf1 / sf10 fixtures for the two tables the heaviest
catalog rows consume (documents, embeddings) by deterministic key-space
replication of the driver's sf0.1 fixture:

  * documents: copy k prefixes EVERY WORD with "v{k}x" — word-level
    tagging, not a text prefix, because a prefix alone leaves the text
    BODY identical across copies: every shingle/MinHash/Jaccard
    operator would then see the K copies of each doc as one K-clique
    of near-dups and the probe would time a quadratically-degenerate
    workload that looks like operator super-linearity but is really
    output size. Word tagging gives each copy a disjoint vocabulary
    (no cross-copy candidates anywhere: shingles, n-grams,
    sorted-neighborhood keys and DSIR buckets all separate) while
    preserving the ORIGINAL dup/near-dup structure within each copy —
    the workload scales linearly in rows with realistic match
    structure. doc_id offsets by k * 10**7; lang/source stay verbatim
    (dsir_select's source-stratified buckets keep their shape);
    n_chars is recomputed from the tagged text.
  * embeddings: copy k offsets vec_id by k * 10**7 and adds 1e-4 * k
    to dimension (k mod 64) — norms and cluster geometry are preserved
    to ~1e-4 so the kmeans workload scales in rows, not in iteration
    behavior.

No RNG anywhere: byte-identical output on every run. All other tables
are symlinked from sf0.1 so any catalog entry can run against the
probe dir. Output goes to /root/repo/.probe/sf{1,10} (gitignored;
~6 MB + ~60 MB) and is consumed by tools/scale_probe.py, which
appends the probe dirs to its SF ladder when they exist.

Usage: python3 tools/make_probe_fixture.py [mult ...]   (default 10 100)
mult 10 -> .probe/sf1, mult 100 -> .probe/sf10 (sf0.1 x mult).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events")
OFFSET = 10**7


def build(mult: int) -> str:
    sf = 0.1 * mult
    name = f"sf{sf:g}"
    out = os.path.join(REPO, ".probe", name)
    os.makedirs(out, exist_ok=True)

    # ONE FILE PER COPY, not one big file: Spark parallelizes a parquet
    # scan by byte ranges, so a single ~6 MB file is ONE input split no
    # matter how many row groups it holds — a single-file sf1 fixture
    # would time the operators 1/32nd-parallel and report a fake knee
    # (the exact single-split trap _spread exists for). A production
    # corpus is many files; the probe fixture mirrors that.
    con = duckdb.connect()
    ddir = f"{out}/documents.parquet"
    os.makedirs(ddir, exist_ok=True)
    for k in range(mult):
        tag = f"v{k}x"
        q = (f"SELECT doc_id + {k * OFFSET} AS doc_id, "
             f"'{tag}' || replace(text, ' ', ' {tag}') AS text, "
             f"lang, source, "
             f"CAST(length('{tag}' || replace(text, ' ', ' {tag}')) "
             f"AS BIGINT) AS n_chars "
             f"FROM read_parquet('{SRC}/documents.parquet')")
        con.execute(f"COPY ({q}) TO '{ddir}/part-{k:05d}.parquet' "
                    f"(FORMAT PARQUET)")

    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec = np.asarray(t["embedding"].combine_chunks().flatten(),
                     dtype=np.float32).reshape(len(t), -1)
    dim = vec.shape[1]
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    labels = np.asarray(t["label"], dtype=np.int32)
    edir = f"{out}/embeddings.parquet"
    os.makedirs(edir, exist_ok=True)
    for k in range(mult):
        v = vec.copy()
        v[:, k % dim] += 1e-4 * k
        part = pa.table({
            "vec_id": pa.array(ids + k * OFFSET, type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(v.ravel(), type=pa.float32()), dim).cast(
                    pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        })
        pq.write_table(part, f"{edir}/part-{k:05d}.parquet")

    for tbl in TABLES:
        link = f"{out}/{tbl}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{tbl}.parquet", link)
    return out


def build_graph(mult: int) -> str:
    """Graph-probe fixture (r10, VERDICT r9 ask #2): the graph family
    is lineitem-bound (part co-purchase edges), and the shared probe
    dirs symlink lineitem from sf0.1 — so the r8/r9 decades never grew
    the graph. This builds .probe/gsf{1,10}: lineitem replicated by
    key-space offset on BOTH l_orderkey and l_partkey (copy k offsets
    by k*1e7), producing k disjoint copies of the sf0.1 co-purchase
    graph — rows scale linearly with realistic structure and ZERO
    cross-copy edges (the same no-cross-copy-candidates convention as
    the word-tagged documents fixture). Only the two columns the graph
    family reads are written (Catalyst would prune the rest anyway);
    one file per copy for honest input splits. Other tables symlink
    from sf0.1."""
    sf = 0.1 * mult
    name = f"gsf{sf:g}"
    out = os.path.join(REPO, ".probe", name)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    ldir = f"{out}/lineitem.parquet"
    os.makedirs(ldir, exist_ok=True)
    for k in range(mult):
        q = (f"SELECT l_orderkey + {k * OFFSET} AS l_orderkey, "
             f"l_partkey + {k * OFFSET} AS l_partkey "
             f"FROM read_parquet('{SRC}/lineitem.parquet')")
        con.execute(f"COPY ({q}) TO '{ldir}/part-{k:05d}.parquet' "
                    f"(FORMAT PARQUET)")
    for tbl in TABLES:
        if tbl == "lineitem":
            continue
        link = f"{out}/{tbl}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{tbl}.parquet", link)
    for tbl in ("documents", "embeddings"):
        link = f"{out}/{tbl}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{tbl}.parquet", link)
    return out


def main() -> None:
    args = sys.argv[1:]
    graph = "--graph" in args
    mults = [int(a) for a in args if a != "--graph"] or [10, 100]
    for m in mults:
        print(build_graph(m) if graph else build(m))


if __name__ == "__main__":
    main()
