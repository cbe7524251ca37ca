"""data_warehousing_assignment_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference repo ``ManishReddyKovvuri/Data-Warehousing-Assignment`` (a pandas +
PostgreSQL + dbt Kimball star-schema warehouse), re-expressed Spark-first:

* declarative DataFrame/SQL plans (Catalyst does pushdown/pruning/reordering),
* broadcast star joins, partition-pruned incremental loads,
* pure-functional SCD2 / dim-upsert / fact-dedup pipelines (no in-place
  mutation — the reference's ``ALTER TABLE ... UPDATE ... FROM`` staging
  enrichment becomes immutable joins),
* plus a 100 TB-oriented extension surface (dedup, similarity search, text
  analysis, multimodal plumbing, Structured Streaming) the reference lacks.

Layout:
  sources/    scans + sinks (parquet/csv/json readers, table/view writers)
  functions/  scalar column functions (cleaning, dates, text analysis)
  operators/  relational + dataflow operators (joins, aggs, windows, dedup,
              similarity)
  plans/      composite pipelines (SCD2, dims, facts, KPI views, DQ/audit)
  streaming/  Structured Streaming surface over event streams
"""

__version__ = "0.1.0"
