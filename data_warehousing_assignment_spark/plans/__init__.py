"""Composite pipeline operators (SURVEY.md §2.9): SCD2 merge, conformed-dim
upsert, incremental fact load, snapshot fact, DQ/audit logging, KPI views.

Each module re-expresses one reference pipeline as a pure function over
DataFrames — no in-place mutation (the reference ALTERs staging tables in
place; Spark's immutable frames make every step a join/withColumn instead).
"""
