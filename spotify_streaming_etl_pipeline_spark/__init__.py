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
    main.py       -- CLI entry point (reference scripts/main.py analogue)
    sources/      -- scans: JSON history, parquet catalog, REST
                     enrichment with retry + dead-letter (S3/S4/S7)
    functions/    -- scalar column-expression library (SURVEY §2.8)
    plans/        -- relational plans: dims, facts, marts, mapping,
                     analytics + the oracle-gated query registry
                     (llm_*_gates, llm_evals, extras)
    operators/    -- engine-level ops: idempotent writer, surrogate keys,
                     staging lifecycle, bucketed layouts, skew salting
    llm/          -- LLM-curation ops: dedup (exact/MinHash-LSH/SimHash/
                     n-gram Jaccard/embedding-cosine), cosine top-k +
                     LSH + IVF ANN, text analysis, quality filtering &
                     source mixing, multimodal binary columns
    streaming/    -- Structured Streaming ingest (readStream + watermark
                     + foreachBatch + session windows + stateful dedup)

Correctness: every operator registers a (Spark plan, DuckDB oracle SQL)
pair in the repo-root __spark_entry__.py; see COVERAGE.md for the
SURVEY §2 row-by-row map and PLANS.md for the physical-plan audit.
"""

__version__ = "0.2.0"
