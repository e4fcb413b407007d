"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (Eugenia-DE/ecs-ecommerce-data-pipeline).

The reference is an AWS batch ETL (Lambda + Step Functions + ECS pandas
validation + ECS PySpark transformation + DynamoDB KPI sinks). This package
re-expresses those capabilities as a single idiomatic Spark engine:

- ``schemas``     — explicit StructType schemas (vs stringly CSV inference)
- ``sources``     — parquet/CSV readers, testdata loaders, keyed sinks
- ``operators``   — validation, KPI aggregation, dedup, similarity, text
- ``functions``   — portable deterministic helpers (decimal-routed money
                    aggregation, md5-based hashing usable in oracle SQL)
- ``plans``       — incremental/batch-ledger recompute
- ``streaming``   — Structured Streaming variants

Design stance (SURVEY.md §7.0): DataFrame-first, Catalyst-optimized, no
row-at-a-time Python UDFs on the hot path, partition-pruning-friendly
predicates, broadcast for dimension joins.
"""

__version__ = "0.1.0"
