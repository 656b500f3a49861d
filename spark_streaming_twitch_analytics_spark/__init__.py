"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ``lheuveline/spark-streaming-twitch-analytics``
(a Scala Spark-DStream Twitch chat analytics app), rebuilt Spark-first:

- DataFrame / Catalyst end-to-end (the reference hops RDD<->DF per batch,
  ``SparkRunner.scala:72,77,110``); here there is ONE declarative plan.
- Structured Streaming replaces DStream + ``updateStateByKey``
  (``SparkRunner.scala:118,127,171-188``).
- All reference UDFs become built-in column expressions except the pluggable
  model scorer, which is an Arrow-batched ``pandas_udf``
  (vs per-row HTTP in ``TFInterface.scala:81-92``).

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, sized shuffles)
- ``tables``     testdata star-schema loaders
- ``constants``  shared vocab: stopwords, labels, outliers (also feed oracle SQL)
- ``sources/``   batch + streaming sources and sinks (IRC sim, CSV, KV store)
- ``functions/`` column-expression library (text, scoring, vectors)
- ``operators/`` composed relational operators (messages, merge, topk,
                 training, dedup, similarity, multimodal)
- ``plans/``     plan-inspection helpers (pushdown/broadcast assertions)
- ``streaming/`` Structured Streaming queries (running counts, snapshot sinks)
- ``registry``   the query registry that backs ``__spark_entry__.py``
"""

__version__ = "0.1.0"
