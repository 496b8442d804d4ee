"""spark-cdc-engine: a PySpark-native engine with the query and
data-processing capabilities of aws-samples/dynamodb-pitr-restore-cdc.

The reference (see /root/reference, SURVEY.md) is a DynamoDB
point-in-time-restore + CDC buffer-and-replay pipeline. Its semantics —
ordered change streams, content dedup, upsert/delete merge, dead-letter
routing, batched sinks (reference: app/lambdas/lambda-backfill/main.py:31-46,
cdk/lib/cdk-stack.ts:43-65) — are re-expressed here Spark-first:

- batch analytic surface: DataFrame/SQL on Catalyst (operators/, functions/)
- CDC core: net-effect-per-key merge (operators/cdc.py)
- streaming path: Structured Streaming + foreachBatch (streaming/)
- LLM-data-pipeline extension: dedup / similarity / text analysis (llm/)

Every public query is registered in `registry` with a DuckDB oracle-SQL
twin where SQL-expressible; `__spark_entry__.py` re-exports the registry
for the driver.
"""

__version__ = "0.1.0"
