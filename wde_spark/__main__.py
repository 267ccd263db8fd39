"""CLI dispatcher — the engine's equivalent of the reference's `main.py`
(reference: main.py:17-66; pipeline.sh runs -n && -i && -s && -w).

    python -m wde_spark -n            # build the nametable TSV
    python -m wde_spark -i            # resolve names to QIDs (offline cache)
    python -m wde_spark -i --live     # ... with live API fetch for misses
    python -m wde_spark -w            # reinject QIDs into the TEI XML
    python -m wde_spark -c            # trait word-frequency table
    python -m wde_spark -t            # golden-set quality metrics
    python -m wde_spark --all         # -n -i -w in sequence

Paths default to the reference layout rooted at --root; every stage is a
deterministic batch job (resume = re-run; outputs are overwritten
atomically), replacing the reference's append-log bookkeeping.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _args(argv):
    p = argparse.ArgumentParser(prog="wde_spark", description=__doc__)
    p.add_argument("-n", "--nametable", action="store_true")
    p.add_argument("-i", "--itemtoid", action="store_true")
    p.add_argument("-s", "--sparql", action="store_true")
    p.add_argument("-w", "--wd2tei", action="store_true")
    p.add_argument("-c", "--counter", action="store_true")
    p.add_argument("-t", "--test", action="store_true")
    p.add_argument("--all", action="store_true", help="-n -i -w")
    p.add_argument("--root", default="/root/reference",
                   help="corpus root (Catalogues/, script/logs, script/tables)")
    p.add_argument("--out", default="./wde_out", help="output directory")
    p.add_argument("--live", action="store_true",
                   help="fetch cache misses from the live Wikidata API")
    p.add_argument("--cpus", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None) -> int:
    a = _args(argv if argv is not None else sys.argv[1:])
    if a.all:
        a.nametable = a.itemtoid = a.wd2tei = True
    if not any((a.nametable, a.itemtoid, a.sparql, a.wd2tei, a.counter, a.test)):
        print("nothing to do (see --help)", file=sys.stderr)
        return 2

    from pyspark.sql import functions as F

    from .core.session import get_session
    from .plans.nametable import nametable_rows
    from .plans.resolve import build_idset, resolve_offline
    from .sources.cache import read_query_cache
    from .sources.tabular import write_id_list, write_tsv
    from .sources.tei import read_tei_items

    spark = get_session("wde_cli", cpus=a.cpus)
    os.makedirs(a.out, exist_ok=True)
    cats = os.path.join(a.root, "Catalogues", "*", "CAT_*.xml")
    cache_glob = os.path.join(a.root, "script", "logs", "idqueried_*.json")
    t_start = time.time()

    items = nt = resolved = None
    if a.nametable or a.itemtoid or a.wd2tei or a.counter:
        items = read_tei_items(spark, cats)
        nt = nametable_rows(items).cache()

    if a.nametable:
        write_tsv(
            nt.select(F.col("xml_id").alias("xml id"),
                      F.col("wd_id").alias("wikidata id"),
                      "name", "trait"),
            os.path.join(a.out, "nametable_in.tsv"),
        )
        print(f"[-n] nametable_in.tsv: {nt.count()} rows")

    if a.itemtoid or a.wd2tei:
        cache = read_query_cache(spark, cache_glob)
        if a.live:
            from .sources.http import resolve_live, wikidata_search_fetcher

            resolved, cache = resolve_live(
                nt, cache, wikidata_search_fetcher())
        else:
            resolved = resolve_offline(nt, cache)
        resolved = resolved.cache()

    if a.itemtoid:
        write_tsv(
            resolved.select(
                F.col("tei_xml_id").alias("tei:xml_id"),
                F.col("wd_id").alias("wd:id"),
                F.col("tei_name").alias("tei:name"),
                F.col("wd_name").alias("wd:name"),
                F.col("wd_snippet").alias("wd:snippet"),
                F.col("tei_trait").alias("tei:trait"),
                F.col("wd_certitude").alias("wd:certitude"),
            ),
            os.path.join(a.out, "nametable_out.tsv"),
        )
        write_id_list(build_idset(resolved), "qid",
                      os.path.join(a.out, "id_wikidata.txt"))
        n = resolved.filter(F.col("wd_id") != "").count()
        print(f"[-i] nametable_out.tsv: {n} resolved")

    if a.sparql:
        if a.live:
            from .sources.http import sparql_fetcher
            from .sources.wdqs import enrich_live

            qids = build_idset(resolved)
            store = enrich_live(qids, sparql_fetcher(), n_workers=4)
            out_path = os.path.join(a.out, "wikidata_enrichments.json")
            rows = store.select(F.to_json(F.struct("qid", "enrichment"))
                                .alias("j")).collect()
            with open(out_path, "w", encoding="utf-8") as f:
                f.write("[" + ",\n".join(r.j for r in rows) + "]\n")
            print(f"[-s] enriched {len(rows)} QIDs -> {out_path}")
        else:
            print("[-s] offline: no recorded SPARQL responses ship with the "
                  "reference; run with --live to fetch from WDQS "
                  "(sources/wdqs.enrich_live), or feed recorded documents to "
                  "plans/enrich.enrich_offline (tests/test_enrich.py).",
                  file=sys.stderr)

    if a.wd2tei:
        from .plans.reinject import reinject

        mapper_src = resolved.select(
            "catalogue_id", "item_pos", "row_pos", "tei_name", "wd_id")
        n = reinject(spark, mapper_src, cats,
                     os.path.join(a.out, "catalogues_wd"))
        print(f"[-w] rewrote {n} catalogues")

    if a.counter:
        from .plans.wordcount import trait_wordcount

        counts = trait_wordcount(nt)
        with open(os.path.join(a.out, "trait_wordcount.json"), "w",
                  encoding="utf-8") as f:
            json.dump({r.word: r.n for r in counts.collect()}, f,
                      ensure_ascii=False, indent=1)
        print(f"[-c] trait_wordcount.json: {counts.count()} words")

    if a.test:
        import csv

        from .plans.metrics import quality_metrics

        golden = os.path.join(a.root, "script", "tables",
                              "nametable_test_withid.tsv")
        rows = []
        with open(golden, encoding="utf-8") as f:
            for i, r in enumerate(csv.reader(f, delimiter="\t", quotechar='"')):
                rows.append(("TEST", 0, i, r[0], r[1], r[2], r[3]))
        gdf = spark.createDataFrame(
            rows, "catalogue_id string, item_pos int, row_pos int,"
                  "xml_id string, truth_id string, name string, trait string")
        cache = read_query_cache(spark, cache_glob)
        scored = resolve_offline(gdf, cache).join(
            gdf.select("row_pos", "truth_id"), "row_pos")
        m = quality_metrics(scored).collect()[0].asDict()
        print(json.dumps(m, indent=1))

    print(f"done in {time.time() - t_start:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
