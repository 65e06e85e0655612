"""Pin the golden top-k fixture (FIXTURES.md §7).

Runs the pure-Python oracle over the 'small' mixed webtext corpus for
every query in fixtures/queryset.json and writes
fixtures/golden_topk.json.  Regeneration is deliberate-only:

    python tools/make_golden.py --update-golden
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_spark.functions.tokenizer import is_boolean_query
from elasticsearch_spark.oracle.engine import OracleIndex
from elasticsearch_spark.sources.webtext import gen_corpus, query_vocab

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DOCS = 1000
K = 10


def build_oracle():
    pool = query_vocab(os.path.join(REPO, "fixtures", "queryset.json"))
    docs = [
        (i, d["text"])
        for i, d in enumerate(
            sorted(
                (d for d in gen_corpus(GOLDEN_DOCS, mix_words=pool) if d["lang"] == "en"),
                key=lambda d: d["url"],
            )
        )
    ]
    return OracleIndex.build(docs)


def main():
    if "--update-golden" not in sys.argv:
        print("refusing to overwrite golden fixture without --update-golden")
        sys.exit(1)
    with open(os.path.join(REPO, "fixtures", "queryset.json")) as f:
        queries = json.load(f)["queries"]
    idx = build_oracle()
    golden = {"n_docs": GOLDEN_DOCS, "k": K, "queries": {}}
    for q in queries:
        if is_boolean_query(q):
            golden["queries"][q] = {
                "type": "boolean",
                "doc_ids": sorted(idx.boolean_query(q)),
            }
        else:
            res = idx.query(q, k=K)
            golden["queries"][q] = {
                "type": "ranked",
                "total_hits": res["total_hits"],
                "results": [
                    {"doc_id": r["doc_id"], "score": round(r["score"], 12)}
                    for r in res["results"]
                ],
            }
    out = os.path.join(REPO, "fixtures", "golden_topk.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1)
    n_ranked = sum(1 for v in golden["queries"].values() if v["type"] == "ranked")
    n_nonempty = sum(
        1
        for v in golden["queries"].values()
        if (v.get("results") or v.get("doc_ids"))
    )
    print(f"pinned {len(golden['queries'])} queries ({n_ranked} ranked, "
          f"{n_nonempty} with non-empty results) -> {out}")


if __name__ == "__main__":
    main()
