"""Source + extractor resolution: config → initial DataFrame.

The reference splits "produce a character stream" (source: file/http/stdin —
``etl/source/``) from "stream → records" (extractor: row/json/jdbc —
``etl/extractor/``). In Spark those fuse into one declarative read, so the
compiler resolves the (source, extractor) pair to a single ``spark.read``:

    file + row   -> spark.read.text            (one row per line)
    file + json  -> spark.read.json            (NDJSON or multiLine array)
    file + csv*  -> spark.read.csv             (fused fast path; the csv
                                                transformer detects a
                                                file-backed `value` column)
    jdbc         -> spark.read.format("jdbc")  (partitioned, not 1 cursor)
    http         -> driver fetch → staged temp file → any of the above
    input        -> driver stdin  → createDataFrame

Extensions beyond the reference: parquet / orc / table / query extractors
(the reference has no columnar source at all).
"""

from orientdb_etl_spark.sources.resolve import resolve_source

__all__ = ["resolve_source"]
