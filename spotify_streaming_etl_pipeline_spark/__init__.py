"""PySpark-native analytics engine with the query and data-processing
capabilities of averelli/Spotify-Streaming-ETL-Pipeline.

The reference (at /root/reference) is a PostgreSQL-backed batch ETL;
this package re-expresses every operator it implements (SURVEY.md §2)
as idiomatic Spark DataFrame / SQL plans, adds the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal), and a
Structured Streaming front end for the reference's hand-rolled
incremental-load semantics.

Layout:
    session.py    -- SparkSession factory tuned for scale (AQE, broadcast)
    schemas.py    -- declared StructTypes (never inferSchema)
    sources/      -- scans: JSON history, parquet catalog, REST enrichment
    functions/    -- scalar column-expression library (SURVEY §2.8)
    plans/        -- relational plans: dims, facts, marts, mapping, analytics
    operators/    -- engine-level ops: idempotent writer, surrogate keys,
                     dedup family, similarity search, text ops, multimodal
    streaming/    -- Structured Streaming ingest (readStream + foreachBatch)
"""

__version__ = "0.1.0"
