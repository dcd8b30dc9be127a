"""solana_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Solana token-launch ETL + analytics pipeline
(dariusbaker6/solana-etl-pipeline), re-expressed Spark-first:

- batch analytics via the DataFrame / Spark SQL API (Catalyst-optimized),
- ingestion via Structured Streaming (file-landing sources, checkpointed
  exactly-once dedup replacing the reference's hand-rolled state ledger),
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal column plumbing) designed for 100 TB scale.

Nothing here is a port: the reference (imperative Python loops hopping
through S3) defines WHAT is computed; Spark defines HOW.
"""

__version__ = "0.1.0"
