"""pgcdc_spark — a PySpark-native analytics + CDC engine.

A from-scratch engine with the query and data-processing capabilities of
the reference CDC PoC (pagopa/pg-cdc-poc, surveyed in SURVEY.md), rebuilt
Spark-first:

- batch + streaming relational operators expressed as Catalyst logical
  plans (DataFrame / SQL API) so predicate pushdown, column pruning, AQE
  and whole-stage codegen apply automatically;
- a CDC core (pgoutput-shaped envelope parse -> filter -> checked extract
  -> keyed upsert materialization honoring deletes) replacing the
  reference's per-event callback pipeline
  (reference: src/mapping/customMapper.ts:12-34, src/main.ts:69-90);
- LLM-data-pipeline operators (dedup exact/MinHash/SimHash, similarity
  search, text analysis, multimodal column plumbing) designed for 100 TB
  scale: no collect-to-driver, shuffle-conscious, broadcast-aware.
"""

__version__ = "0.1.0"
