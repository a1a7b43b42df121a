"""dbt_schema_builder_spark — a PySpark-native engine with the query and
data-processing capabilities of edx/dbt-schema-builder.

The reference (/root/reference) is a metadata-driven SQL/view generator for
Snowflake + dbt: for each application schema it builds the "trifecta"
<SCHEMA>_RAW / <SCHEMA>_PII / <SCHEMA> (redacted) with identical column count
and order (reference README.rst:10-24). This package re-expresses that whole
pipeline natively on Spark:

- ``catalog``   — schema introspection as a columns DataFrame
                  (reference queries.py:11-33, builder.py:40-174)
- ``policy``    — config-driven filters / renames / redactions / soft-delete
                  predicates as pure DataFrame -> DataFrame transforms
                  (reference schema.py:83-112, relation.py:48-79, templates/)
- ``views``     — trifecta materialization via CREATE OR REPLACE VIEW /
                  createOrReplaceTempView (reference relation.py:251-288)
- ``operators`` — the north-star analytics extensions: relational (joins,
                  aggregations, windows), dedup, similarity search, text
                  analysis, JSON/multimodal, time windows
- ``streaming`` — Structured Streaming variants of the time/stateful ops

Everything relational rides Catalyst; no custom optimizer rules are needed
(SURVEY.md section 4).
"""

__version__ = "0.1.0"
