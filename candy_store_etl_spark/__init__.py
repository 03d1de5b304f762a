"""candy_store_etl_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query/data-processing capabilities of
the ``AdityaJayanthVadali/Candy-Store-ETL`` reference pipeline
(surveyed in SURVEY.md), designed Spark-first:

- declarative DataFrame / SQL plans, Catalyst does the optimizing;
- explicit schemas everywhere (never infer in production paths);
- no driver-side materialization of fact-sized data — stateful logic
  (inventory allocation, forecasting) runs distributed via
  ``applyInPandas`` grouped-map operators;
- dimension joins broadcast, fact joins shuffle on their keys, AQE on;
- extension operators for large-scale training-data pipelines:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search (brute-force + LSH-bucketed ANN), text analysis,
  and multimodal binary-column plumbing.
"""

__version__ = "0.1.0"
