"""pg_iui_ner_api_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the data-processing capabilities of the reference
``Bezimienii/PG-IUI-NER-API`` (a per-request FastAPI NER microservice,
see /root/reference) as a batch, columnar, Catalyst-optimized Spark
pipeline over an interleaved text+media document corpus:

    documents -> mentions (NER) -> candidates/links (entity linking)
              -> components (canonicalization) -> nodes/edges (triples)

Design rules (enforced across the package):
  * DataFrame/SQL first; Catalyst does pushdown/pruning/join selection.
  * The only JVM->Python crossings are Arrow-batched pandas UDFs
    (``mapInPandas``); zero per-row Python on the hot path.
  * Explicit hash partitioning on ``doc_id`` so downstream stages are
    co-partitioned and re-shuffles are avoided.
  * Deterministic everywhere: content hashes instead of uuid4()/now()
    (the reference uses both on its data path, main_endpoints.py:84,100).
"""

__version__ = "0.1.0"
