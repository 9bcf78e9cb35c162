"""classification_pyspark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
``abhirup77/classification-pyspark`` (see SURVEY.md): config-driven batch
orchestration, data-cleaning / EDA / feature-engineering / model-eval
operator libraries — plus large-scale LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal columns) designed
for a 100 TB, 1000-executor deployment.

Design rules (SURVEY.md §7 "What's hard" #5):
- DataFrame/SQL only; no RDDs.
- No driver-side ``collect()`` / ``toPandas()`` inside any operator path;
  learned maps stay distributed and are applied via broadcast joins.
- Built-in ``pyspark.sql.functions`` (JVM, whole-stage codegen) in hot
  paths; Arrow-batched pandas UDFs only where built-ins cannot express
  the semantics (multimodal decode).
"""

__version__ = "0.1.0"
