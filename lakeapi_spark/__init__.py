"""lakeapi_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of bmsuisse/lakeapi.

The reference (/root/reference, bmsdna/lakeapi) is a query *compiler*:
YAML config + HTTP params -> sqlglot AST -> DuckDB/Polars execution.
This package re-founds the same semantics on Spark: the compiler layers
are pure Python over ``pyspark.sql`` Column/DataFrame expressions, and
Catalyst/Tungsten supply optimization and execution.

Layout
------
- ``session``      SparkSession factory (Arrow, AQE, sane shuffle defaults)
- ``config``       declarative table/param config (ref: core/config.py)
- ``registry``     table registry -> temp views   (ref: core/route.py)
- ``sources``      scan layer for parquet/delta/csv/json/ndjson/arrow
- ``operators``    the compiled operator surface (SURVEY.md §2):
    - ``filters``            param -> Column filter algebra (§2.3)
    - ``pipeline``           the single-table SELECT pipeline (§2, §3.1)
    - ``partitioning``       md5/prefix derived partition pruning (§2.12)
    - ``search``             portable LIKE scorer + TF + BM25 (§2.10)
    - ``nearby``             haversine geo filter (§2.11)
    - ``joins``              as-of join (union + running-last window),
                             binned interval join
    - ``skew``               skew-safe exact distinct counting
    - ``sampling``           stable hash sampling / train-eval splits,
                             mixture reweighting, quota caps,
                             shuffle+shard training export
    - ``dedup``              exact/minhash/simhash/jaccard/embedding,
                             SemDeDup semantic (Arrow kernels, n_probe),
                             substring spans + cut, incremental ingest
                             guard, connected components
    - ``similarity``         brute-force + LSH + IVF ANN over embeddings
    - ``text``               lang-id, quality, repetition metrics,
                             corpus-unigram logprob, word-id export,
                             tokens (ws + BPE-ish), chunking,
                             md5 + rolling-hash fingerprints
    - ``multimodal``         binary-column plumbing + JVM-side
                             PNG/WAV/JPEG header decode
    - ``windows``            event-time windowed aggregation (batch form)
    - ``packing``            deterministic context-window packing
    - ``contamination``      benchmark n-gram overlap sweep
    - ``scale``              fan-out guard for narrow CPU-bound scans
- ``sql``          validated SQL endpoint -> spark.sql (§2.8, §3.2)
- ``metadata``     schema tree / partition values / str-lengths (§2.15)
- ``serialize``    Arrow-based output formats (§2.2)
- ``streaming``    Structured Streaming pipeline over events (§7)
"""

from lakeapi_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
