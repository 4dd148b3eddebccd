"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``sv3ndk/kafka-streams-one-to-many-join``.

The reference is a Kafka Streams POC implementing a continuously-maintained
one-to-many foreign-key equi-join with table (upsert/latest-value) semantics
on both sides and delete propagation on the many side
(reference: DemoApp.scala:50-60).  This package re-expresses that capability
— plus a general relational operator surface and large-scale training-data
pipeline operators — Spark-first: declarative DataFrame plans optimized by
Catalyst, with custom stateful operators only where the built-ins genuinely
cannot express the semantics (the table-semantics streaming join).

Layout:
  session    SparkSession factory tuned for scale (AQE, RocksDB state, Arrow)
  model      schemas for the reference domain + testdata tables
  operators  core relational/stream-table operators (latest_by_key, joins,
             change detection, arrive/leave expansion)
  functions  text analysis, dedup (exact/minhash/simhash/ngram), similarity
             search, multimodal binary-column plumbing
  sources    batch + streaming readers/writers (parquet/json/kafka/rate)
  streaming  stateful symmetric one-to-many join with upsert/delete state
  plans      plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
