"""mapreduce_wsi_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``acgessler/mapreduce-wsi`` (a SOAP web service exposing Hadoop MapReduce +
Sqoop JDBC import/export; see ``/root/reference``) as an idiomatic Spark
DataFrame engine, extended with the relational / streaming / LLM-data-
pipeline operator surface described in SURVEY.md §2.

Layout:
    session.py            SparkSession factory + engine config (ref: ConfigStub.java:20-48)
    scope.py              scoped namespaces (ref: MapReduceWSIImpl.java:59-87)
    sources/files.py      text/csv/parquet/json scan + sink (ref: Runner.java:36-40)
    sources/jdbc.py       partitioned JDBC ingest/egress (ref: MapReduceWSIImpl.java:220-305)
    operators/dataflow.py run_job / pipe_map_reduce (ref: MapReduceWSIImpl.java:89-211)
    operators/relational.py  joins/aggs/windows/setops/topk recipes
    operators/dedup.py    exact/minhash/simhash/jaccard dedup (north-star extension)
    operators/similarity.py  embedding cosine top-k / ANN (north-star extension)
    operators/text.py     lang-id, quality, tokens, fingerprints (north-star extension)
    operators/multimodal.py  binary-column decode/feature plumbing (north-star extension)
    functions/__init__.py integer-mean et al. (ref: TestReducer.java:26-38)
    plans/catalog.py      the queries()/oracle_sql() inventory (driver contract)
    streaming/windows.py  tumbling/sliding/session windows over events
"""

from mapreduce_wsi_spark.session import Engine, get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
