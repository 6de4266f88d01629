"""Per-stage wall-time profile of the KG pipeline (tuning harness)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_iui_ner_api_spark import synth
from pg_iui_ner_api_spark.operators import components as C, linking as L, ner as N, triples as T
from pg_iui_ner_api_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
PAR = int(sys.argv[2]) if len(sys.argv) > 2 else 32

spark = get_spark(app_name="profile", master=f"local[{PAR}]", shuffle_partitions=PAR)
spark.sparkContext.setLogLevel("ERROR")


def step(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name:24s} {time.monotonic() - t0:8.2f}s", flush=True)
    return out


from pyspark import StorageLevel

docs = synth.synth_documents(spark, N_DOCS)
step("synth(count)", lambda: docs.count())

extraction = N.extract(docs).repartition(PAR, "doc_id").persist(StorageLevel.MEMORY_AND_DISK)
step("extract", lambda: extraction.count())

mentions = N.mentions_of(extraction)
predicates = N.predicates_of(extraction)

alias = synth.alias_df(spark)
embs = synth.entity_emb_df(spark)
linked = L.link_mentions(mentions, alias, embs).persist(StorageLevel.MEMORY_AND_DISK)
step("link", lambda: linked.count())

comps = step("components(build)", lambda: C.canonical_components(linked))
step("components(count)", lambda: comps.count())

nodes = C.canonical_nodes(linked, comps)
step("nodes", lambda: nodes.count())

edges = T.assemble_triples(linked, predicates)
step("edges", lambda: edges.count())
