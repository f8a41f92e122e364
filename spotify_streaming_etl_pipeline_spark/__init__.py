"""PySpark-native analytics engine with the query and data-processing
capabilities of averelli/Spotify-Streaming-ETL-Pipeline.

The reference (at /root/reference) is a PostgreSQL-backed batch ETL;
this package re-expresses every operator it implements (SURVEY.md §2)
as idiomatic Spark DataFrame / SQL plans, adds the LLM-data-pipeline
operators (dedup family, similarity search, text analysis, multimodal
columns), and a Structured Streaming front end for the reference's
hand-rolled incremental-load semantics.

Layout:
    session.py    -- SparkSession factory tuned for scale (AQE, broadcast)
    schemas.py    -- declared StructTypes (never inferSchema)
    pipeline.py   -- end-to-end batch runner: raw JSON -> dims -> facts
    sources/      -- scans: JSON history, parquet catalog, REST
                     enrichment with retry + dead-letter (S3/S4/S7)
    functions/    -- scalar column-expression library (SURVEY §2.8)
    plans/        -- relational plans: dims, facts, marts, mapping,
                     analytics + the oracle-gated query registry
                     (llm_queries, extras)
    operators/    -- engine-level ops: idempotent writer, surrogate keys
    llm/          -- LLM-curation ops: dedup (exact/MinHash-LSH/SimHash/
                     n-gram Jaccard), cosine top-k + LSH ANN, text
                     analysis, multimodal binary columns
    streaming/    -- Structured Streaming ingest (readStream +
                     watermark + foreachBatch over the same builders)
"""

__version__ = "0.2.0"
