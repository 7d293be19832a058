"""aws_insurancelake_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``aws-solutions-library-samples/aws-insurancelake-etl``
(3-zone insurance lake ETL: Collect → Cleanse → Consume) on plain open-source
Apache Spark, without the AWS control plane, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB-class clusters.

Layout:
- ``session``      — SparkSession factory tuned for AQE / Arrow / broadcast
- ``context``      — run context (job args, lineage, lookup store)
- ``sources``      — file readers (csv/tsv/pipe/json/parquet/fixed/xml/excel)
- ``operators``    — the declarative transform registry (``transform_<name>``)
- ``plans``        — pipeline stages, DQ rule compiler, schema gate, writer
- ``streaming``    — Structured Streaming ingest
- ``functions``    — reusable column-level functions (similarity, hashing...)
"""

__version__ = "0.1.0"
