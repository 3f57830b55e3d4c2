#!/usr/bin/env python3
"""Scaling-curve probe: run representative catalog queries at every
available fixture scale factor and report the per-decade growth of wall
time — the measured counterpart to SCALE.md's design arguments.

A plan whose time grows ~linearly in SF (slope ~1 in log-log) is
shuffle/scan bound and scales out by adding executors; a slope well
below 1 at these sizes means fixed scheduling latency still dominates
(the query is "free" until data gets much bigger); a slope above ~1.2
flags super-linear work (the thing SCALE.md promises none of).

Usage: python3 tools/scale_probe.py [query ...]
Prints one JSON line: {query: {sf: sec, ..., "slope": b}} where slope is
the least-squares exponent of time ~ SF^b over the measured points.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "q1_pricing_summary",       # scan + partial/final agg
    "q18_large_volume_customer",  # fact-fact join + agg + topk
    "dedup_minhash_lsh",        # shingle agg + band self-join
    "dedup_prefix_filter",      # rank join + prefix self-join + verify
    "graph_pagerank",           # iterative equi-joins (constant rounds)
    "events_ewma_smooth",       # one bounded-frame window
    "heavy_hitters_mg",         # Arrow partition sketch + tiny combine
    "mm_decode_ppm",            # Arrow decode kernel, map-only
    "dedup_components_star",    # O(log n) star contraction rounds
    "dedup_semdedup",           # IVF build + within-cell cosine join
    "mm_decode_jpeg",           # heaviest per-row Arrow kernel
    # r6 additions with real data volume
    "mm_decode_jpeg_progressive",  # 4-scan Annex G entropy walk
    "text_bigram_pmi",          # zero-join bigrams + dictionary joins
    "eval_retrieval_metrics",   # query x corpus scoring fan-out
    "sketch_cms_frequency",     # one-scan sketch build + probes
    "eval_group_auc",           # window over per-score aggregate
    # late-r6 tranche (VERDICT r6 ask #4)
    "sketch_tdigest_quantiles",  # per-partition sort+compress Arrow pass
    "mm_resize_area",           # fused decode + block-mean kernel
    "text_char_entropy",        # char histogram HOF, zero joins
    "text_bpe_learn_apply",     # 6 train rounds + literal-replace apply
    "mm_decode_gif_interlaced",  # LZW walk + 4-pass scatter
]

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]

# Knee-probe decades (VERDICT r7 ask #6): .probe/sf1 and .probe/sf10
# scale ONLY the documents + embeddings tables (deterministic key-space
# replication of sf0.1 — tools/make_probe_fixture.py); every other
# table in those dirs is a symlink to sf0.1, so the extra decades are
# meaningful ONLY for queries whose entire input is documents and/or
# embeddings. Restricting by whitelist keeps a lineitem-bound query
# from "running at sf10" against sf0.1 data and faking a flat slope.
PROBE_DIRS = [os.path.join(REPO, ".probe", "sf1"),
              os.path.join(REPO, ".probe", "sf10")]
PROBE_QUERIES = {
    "pipeline_prepare_er",      # documents only
    "cluster_kmeans_lloyd",     # embeddings only
    "dsir_importance_select",   # documents only
    "dedup_minhash_lsh",        # documents only
    "dedup_components_star",    # documents only
    "sim_cosine_topk",          # embeddings only
    "dedup_sorted_neighborhood",  # documents only (r9: slope re-measure
                                  # on the r8 _snm_pass_pairs rebuild)
    # r10 session-2 heavy rows (documents only)
    "dedup_cdc_sentences",        # map-only fold + first-occurrence join
    "text_ccnet_paragraph_lm",    # token explode + vocab join + para agg
    # r11 heavy rows (documents only)
    "text_char_ngram_repetition",  # char explode + (id, gram) window
    "dedup_cdc_cross_snapshot",    # fold both sides + distinct-hash join
    "dedup_cdc_edit_stability",    # two chunkings x two schemes
    "text_line_global_dedup",      # line explode + global df groupBy
    "quality_distill_student_agreement",  # token explode x2 + model join
    "text_js_divergence_snapshots",  # 2 token explodes + vocab join
    "mix_dedup_aware_weights",     # hash groupBy + join-back
    "web_host_crawl_budget",       # salted per-host top-k
    # r12 heavy rows (documents only)
    "dedup_chain_minhash_first_seen",  # 2x incremental minhash legs
    "dedup_chain_cluster_first_seen",  # minhash pairs + CC rounds
    "text_ngram_novelty_decay",        # 5-gram explode + min-snap agg
    "dedup_cdc_chunk_size_audit",      # map-only fold + histogram
    # r13 heavy rows (documents only)
    "mix_bpe_token_budget",        # BPE learn + tokenize + budget tail
    "text_bpe_compression_curve",  # 3 learns + 4 tokenize passes
    "mix_token_vs_char_shift",     # 1 learn + tokenize + share table
}


def main() -> None:
    queries = sys.argv[1:] or DEFAULT_QUERIES
    from mapreduce_wsi_spark.session import get_spark
    spark = get_spark(app_name="scale_probe",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  # the probe decades (sf10 = 500k docs
                                  # x ~200 grams) OOM the 1g JVM
                                  # default; size the local-mode heap
                                  # for the 128 GiB box. Bench keeps
                                  # the plain session — its rows are
                                  # compared round-over-round.
                                  "spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    from mapreduce_wsi_spark.plans.registry import load_catalog
    catalog = load_catalog()

    sf_dirs = [d for d in SF_DIRS if os.path.isdir(d)]
    probe_dirs = [d for d in PROBE_DIRS if os.path.isdir(d)]
    # one full warm pass (codegen + parquet footers) — excluded
    for d in sf_dirs + probe_dirs:
        spark.read.parquet(f"{d}/lineitem.parquet").limit(1).count()

    # same production-path substitutions as the bench (sketch entries
    # bundle exact anchors for the driver contract; the slope of
    # interest is the operator's)
    sys.path.insert(0, REPO)
    from bench import _bench_overrides
    overrides = _bench_overrides()

    out: dict[str, dict] = {}
    for name in queries:
        entry = catalog.get(name)
        if entry is None:
            continue
        if name in overrides:
            from mapreduce_wsi_spark.plans.registry import CatalogEntry
            entry = CatalogEntry(fn=overrides[name], oracle=None)
        row: dict[str, float] = {}
        dirs = sf_dirs + (probe_dirs if name in PROBE_QUERIES else [])
        for d in dirs:
            sf = d.rsplit("sf", 1)[1]
            # warm once (first-run codegen), then best-of-2 timed
            entry.fn(spark, d).write.format("noop").mode("overwrite").save()
            best = math.inf
            for _ in range(2):
                t0 = time.time()
                entry.fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            row[sf] = round(best, 4)
            print(f"# {name} sf{sf}: {best:.2f}s", file=sys.stderr,
                  flush=True)
        xs = [math.log10(float(sf)) for sf in row]
        ys = [math.log10(v) for v in row.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        row["slope"] = round(slope, 3)
        out[name] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
