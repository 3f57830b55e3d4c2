"""Scope lifecycle (A1/A2), dataflow surface (A5/A6), and JDBC edges (A3/A4).

The pipe test replays the reference's streaming protocol end to end with
python3 scripts speaking the exact stdin/stdout contract
(EndToEndTest.java:84-98) over the reference's golden rotating-pattern
fixture (every column's integer mean is exactly 3, EndToEndTest.java:37-54).

JDBC integration runs against embedded Apache Derby (bundled with Spark) —
a real RDBMS round-trip: populate -> partitioned import -> export-append.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_wsi_spark.session import Engine
from mapreduce_wsi_spark.sources.jdbc import (
    ImportQuery,
    bounds_query,
    parse_import_query,
    split_column_projected,
    validate_split_column,
)

MAPPER = """#!/usr/bin/env python3
import sys
for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    for idx, field in enumerate(line.split(",")):
        print(f"{idx}\\t{int(field.strip())}")
"""

# relies on sorted, contiguous keys — exactly the reference reducer's
# itertools.groupby-over-sorted-stdin contract (EndToEndTest.java:91-98)
REDUCER = """#!/usr/bin/env python3
import sys
from itertools import groupby
pairs = (line.rstrip("\\n").split("\\t") for line in sys.stdin if line.strip())
for key, grp in groupby(pairs, key=lambda kv: kv[0]):
    vals = [int(v) for _, v in grp]
    s, n = sum(vals), len(vals)
    print(f"{key}\\t{(s // n) - (s % n) * 100}")
"""


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    return Engine(spark=spark, base_path=str(base))


def test_scope_lifecycle(engine):
    sid = engine.create_scope()
    assert sid > 0
    path = engine.scope_path(sid, "somedata")
    assert str(sid) in path
    assert engine.spark.catalog.databaseExists(f"scope_{sid}")
    engine.delete_scope(sid)
    assert not engine.spark.catalog.databaseExists(f"scope_{sid}")


def test_run_job_contract(engine):
    sid = engine.create_scope()

    def job(spark, prefix, factor):
        assert prefix.endswith(str(sid))
        return spark.range(10).agg((F.sum("id") * factor).alias("s")).collect()[0]["s"]

    assert engine.run_job(sid, job, 2) == 90
    engine.delete_scope(sid)


def test_pipe_map_reduce_reference_protocol(engine):
    """Golden-value e2e: rotating (base+k)%7 pattern -> every mean exactly 3."""
    spark = engine.spark
    sid = engine.create_scope()
    n = 7 * 40
    csv = spark.range(n).select(
        F.concat_ws(",", *[((F.col("id") + k) % 7).cast("string")
                           for k in range(7)]).alias("value"))
    csv.write.mode("overwrite").text(engine.scope_path(sid, "input"))

    engine.pipe_map_reduce(sid, MAPPER, REDUCER, "input", "output",
                           num_reducers=4)

    out = spark.read.text(engine.scope_path(sid, "output")).collect()
    parsed = dict(tuple(map(int, r["value"].split("\t"))) for r in out)
    assert parsed == {i: 3 for i in range(7)}
    engine.delete_scope(sid)


def test_pipe_reducer_sees_sorted_contiguous_keys(engine):
    """A reducer that fails hard on key re-encounter proves the sort/shuffle
    contract (the reference's reducers depend on it)."""
    spark = engine.spark
    sid = engine.create_scope()
    spark.createDataFrame([("b,1",), ("a,2",), ("b,3",), ("a,4",)], ["value"]) \
        .write.mode("overwrite").text(engine.scope_path(sid, "in2"))

    mapper = """#!/usr/bin/env python3
import sys
for line in sys.stdin:
    if line.strip():
        k, v = line.strip().split(",")
        print(f"{k}\\t{v}")
"""
    reducer = """#!/usr/bin/env python3
import sys, itertools
seen = set()
pairs = (l.rstrip("\\n").split("\\t") for l in sys.stdin if l.strip())
for key, grp in itertools.groupby(pairs, key=lambda kv: kv[0]):
    assert key not in seen, f"key {key} not contiguous"
    seen.add(key)
    print(f"{key}\\t{sum(int(v) for _, v in grp)}")
"""
    engine.pipe_map_reduce(sid, mapper, reducer, "in2", "out2", num_reducers=3)
    out = {r["value"].split("\t")[0]: int(r["value"].split("\t")[1])
           for r in spark.read.text(engine.scope_path(sid, "out2")).collect()}
    assert out == {"a": 6, "b": 4}
    engine.delete_scope(sid)


# --------------------------------------------------------------------------
# JDBC fragment handling (pure functions — reference parity)
# --------------------------------------------------------------------------

def test_parse_import_query():
    q = parse_import_query(
        "SELECT input.num0, input.num1 FROM input WHERE input.num0 > 3")
    assert q.select == "input.num0, input.num1"
    assert q.from_ == "input"
    assert q.where == "input.num0 > 3"
    q2 = parse_import_query("SELECT a FROM t")
    assert q2.where is None
    with pytest.raises(ValueError):
        parse_import_query("DELETE FROM t")


def test_split_column_projection_detection():
    q = parse_import_query("SELECT input.num0, input.id FROM input")
    assert split_column_projected(q, "input.id")
    q2 = parse_import_query("SELECT input.num0 AS id_alias FROM input")
    # an AS-alias must NOT count as projecting the split column
    # (MapReduceWSIImpl.java:248-253 uses the same rule)
    assert not split_column_projected(q2, "input.id")


def test_bounds_query_synthesis():
    q = parse_import_query("SELECT t.a FROM t WHERE t.a < 5")
    assert bounds_query(q, "t.id") == \
        "SELECT MIN(t.id) AS mn, MAX(t.id) AS mx FROM t WHERE t.a < 5"


def test_validate_split_column():
    with pytest.raises(ValueError):
        validate_split_column("id")
    validate_split_column("t.id")


# --------------------------------------------------------------------------
# JDBC round-trip against embedded Derby (real RDBMS)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def _derby_ddl(spark, url: str, *statements: str) -> None:
    """Plain-JDBC DDL/DML — the external tables pre-exist outside the
    engine, exactly like the reference's test harness creates them with
    raw java.sql statements (EndToEndTest.java:144-195)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for sql in statements:
            st.executeUpdate(sql)
        st.close()
    finally:
        conn.close()


def test_jdbc_import_export_roundtrip(engine, derby_url):
    spark = engine.spark
    sid = engine.create_scope()

    # populate the "external RDBMS" via plain JDBC, batched inserts
    # (≈ 100-rows-per-INSERT batching, EndToEndTest.java:169-191)
    n = 700
    rows = [(i, i % 7, (i + 1) % 7, (i + 2) % 7) for i in range(1, n + 1)]
    inserts = []
    for lo in range(0, n, 100):
        vals = ", ".join(f"({i}, {a}, {b}, {c})"
                         for i, a, b, c in rows[lo:lo + 100])
        inserts.append(f"INSERT INTO input_tbl VALUES {vals}")
    _derby_ddl(spark, derby_url,
               "CREATE TABLE input_tbl (id BIGINT, num0 INT, num1 INT, num2 INT)",
               *inserts)

    # partitioned import with projection pushdown; split col NOT projected
    # -> bounds synthesis + hidden-split path
    engine.import_jdbc(sid, derby_url,
                       "SELECT num0, num1 FROM input_tbl WHERE num2 > 0",
                       "input_tbl.id", "imported", num_partitions=4,
                       properties=DERBY_PROPS)
    imported = spark.read.parquet(engine.scope_path(sid, "imported"))
    assert [c.lower() for c in imported.columns] == ["num0", "num1"]
    expected = sum(1 for _, _, _, c in rows if c > 0)
    assert imported.count() == expected

    # export back into a pre-existing table (append contract,
    # MapReduceWSI.java:155-158); DF columns uppercase to match unquoted DDL
    _derby_ddl(spark, derby_url,
               "CREATE TABLE output_tbl (ID2 INT, MEAN INT)",
               "INSERT INTO output_tbl VALUES (0, 0)")
    means = imported.groupBy().agg(
        F.lit(1).cast("int").alias("ID2"),
        F.count(F.lit(1)).cast("int").alias("MEAN"))
    means.write.mode("overwrite").parquet(engine.scope_path(sid, "to_export"))
    engine.export_jdbc(sid, derby_url, "output_tbl", "to_export",
                       properties=DERBY_PROPS)

    back = (spark.read.format("jdbc").option("url", derby_url)
            .option("dbtable", "output_tbl").options(**DERBY_PROPS).load())
    assert back.count() == 2  # seed row + appended row
    engine.delete_scope(sid)


def test_jdbc_import_parallelism(engine, derby_url):
    """The import must actually produce the requested number of range
    partitions (Sqoop's m-mapper contract, MapReduceWSI.java:125-135) —
    at 100 TB this is the difference between 1 reader and 1000."""
    spark = engine.spark
    sid = engine.create_scope()
    _derby_ddl(spark, derby_url,
               "CREATE TABLE par_tbl (id BIGINT, v INT)",
               "INSERT INTO par_tbl VALUES " +
               ", ".join(f"({i}, {i % 5})" for i in range(1, 401)))
    from mapreduce_wsi_spark.sources.jdbc import (
        derive_bounds, parse_import_query)
    q = parse_import_query("SELECT id, v FROM par_tbl")
    lo, hi = derive_bounds(spark, derby_url, q, "par_tbl.id",
                           properties=DERBY_PROPS)
    assert (lo, hi) == (1, 400)
    df = (spark.read.format("jdbc").option("url", derby_url)
          .option("dbtable", "(SELECT id, v FROM par_tbl) q")
          .option("partitionColumn", "id")
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", 4).options(**DERBY_PROPS).load())
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 400
    engine.delete_scope(sid)


def test_pipe_map_reduce_ships_aux_files(engine, tmp_path):
    """The reference ships N side files via repeated -file flags
    (MapReduceWSIImpl.java:194-197); pipe_map_reduce(files=[...]) must make
    them readable from both stages via $MRWSI_FILES_DIR."""
    spark = engine.spark
    sid = engine.create_scope()
    lookup = tmp_path / "offsets.tsv"
    lookup.write_text("0\t100\n1\t200\n2\t300\n")
    spark.createDataFrame([("1,2,3",), ("4,5,6",)], ["value"]) \
        .write.mode("overwrite").text(engine.scope_path(sid, "auxin"))

    mapper = """#!/usr/bin/env python3
import sys
for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    for idx, field in enumerate(line.split(",")):
        print(f"{idx}\\t{int(field)}")
"""
    # reducer adds a per-key offset read from the shipped side file
    reducer = """#!/usr/bin/env python3
import os, sys
from itertools import groupby
path = os.path.join(os.environ["MRWSI_FILES_DIR"], "offsets.tsv")
offsets = dict(ln.split("\\t") for ln in open(path).read().splitlines())
pairs = (line.rstrip("\\n").split("\\t") for line in sys.stdin if line.strip())
for key, grp in groupby(pairs, key=lambda kv: kv[0]):
    total = sum(int(v) for _, v in grp)
    print(f"{key}\\t{total + int(offsets[key])}")
"""
    engine.pipe_map_reduce(sid, mapper, reducer, "auxin", "auxout",
                           num_reducers=2, files=[str(lookup)])
    out = {tuple(r.value.split("\t"))
           for r in spark.read.text(engine.scope_path(sid, "auxout")).collect()}
    assert out == {("0", "105"), ("1", "207"), ("2", "309")}
    engine.delete_scope(sid)


def test_pipe_map_reduce_missing_aux_file_raises(engine):
    sid = engine.create_scope()
    with pytest.raises(FileNotFoundError):
        engine.pipe_map_reduce(sid, MAPPER, REDUCER, "x", "y",
                               files=["/nonexistent/aux.txt"])
    engine.delete_scope(sid)


def test_run_job_artifact_from_zip(engine, tmp_path):
    """Bring-your-own-program as a shipped artifact: a zipped Python module
    is added via addPyFile and its main(spark, scope_prefix, *args) runs —
    the in-process twin of the reference's client-JAR contract
    (MapReduceWSIImpl.java:89-115)."""
    import zipfile

    sid = engine.create_scope()
    art = tmp_path / "client_job.zip"
    with zipfile.ZipFile(art, "w") as z:
        z.writestr("client_job_mod.py", (
            "def main(spark, prefix, factor):\n"
            "    df = spark.range(10)\n"
            "    df.write.mode('overwrite').parquet(prefix + '/artifact_out')\n"
            "    return spark.read.parquet(prefix + '/artifact_out')"
            ".count() * factor\n"))
    assert engine.run_job_artifact(sid, str(art), "client_job_mod",
                                   "main", 3) == 30
    engine.delete_scope(sid)


def test_run_job_artifact_missing_raises(engine):
    sid = engine.create_scope()
    with pytest.raises(FileNotFoundError):
        engine.run_job_artifact(sid, "/nonexistent/art.zip", "m")
    engine.delete_scope(sid)
