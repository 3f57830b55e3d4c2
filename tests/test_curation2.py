"""r11 tranche property tests: the star valve's mixed-bucket recall
contract (VERDICT r10 ask #3 — measured, not asserted), the CDC
edited-page stability gap the cross-snapshot entries rely on, and the
distillation model's sanity.

The valve fixtures construct SIGNATURE tables directly (the valve
lives in lsh_candidate_pairs, which consumes signatures) because a
genuinely MIXED oversized bucket is nearly unreachable through real
MinHash: a doc at jaccard j shares a full r-row band with the rest of
a bucket with probability ~j^r, so low-similarity members land in a
bucket at ~0.5^4 = 6% per band — bucket membership self-selects for
similarity. The constructed fixtures pin the two regimes that matter:

* SECONDARY-HUB RESCUE (common): satellites share every band, the
  dissimilar core shares one. Every oversized band bucket stars
  around its own hub, and the all-satellite buckets' hub is itself a
  satellite — so satellite-satellite connectivity survives through
  that hub. Pair recall drops to (m-1)/C(m,2); CLUSTERS are intact.
* SINGLE-SHARED-BAND WORST CASE: the only bucket containing the
  satellites also contains the core, and the core is the hub. Every
  star edge fails verification, the satellite cluster is LOST. This
  is the valve's real recall exposure, priced by how rarely a
  same-bucket pair fails verification (bucket membership ~j^r).

Numbers from this file are recorded in SCALE.md r11.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_wsi_spark.operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
)
from mapreduce_wsi_spark.plans.registry import load_catalog

CATALOG = load_catalog()

N_SAT = 40
SAT_IDS = list(range(2, 2 + N_SAT))


def _sigs(spark, core_bands: str):
    """Signature fixture: 40 satellites with IDENTICAL signatures
    (core_bands='all' -> they share every band with each other) or
    satellites sharing ONLY band 0 with each other is not modeled —
    satellites always share all 16 bands among themselves; the knob is
    the CORE: 'band0' gives the core rows 0-3 equal to the satellites'
    (one shared band), 'none' is unused. Rows are k=64 longs."""
    rows = []
    sat_sig = [7] * 4 + [11] * 60
    for i in SAT_IDS:
        rows.append((i, sat_sig))
    if core_bands == "band0":
        core_sig = [7] * 4 + [900 + j for j in range(60)]
    else:
        raise ValueError(core_bands)
    rows.append((0, core_sig))
    return spark.createDataFrame(rows, "id long, signature array<long>")


def _sigs_single_shared_band(spark):
    """Worst case: satellites agree with EACH OTHER and the core only
    on band 0 — the one oversized bucket holds core + satellites and
    its hub (min id) is the core. Satellite rows 4..63 are unique per
    satellite, so no other bucket exceeds size 1."""
    rows = [(0, [7] * 4 + [900 + j for j in range(60)])]
    for i in SAT_IDS:
        rows.append((i, [7] * 4 + [i * 100 + j for j in range(60)]))
    return spark.createDataFrame(rows, "id long, signature array<long>")


def _verify(cands):
    """Exact-verification stand-in matched to the planted texts:
    satellite-satellite pairs are identical documents (j=1, pass);
    any pair touching the core is dissimilar (j~0, fail)."""
    return cands.filter((F.col("doc_a") != 0) & (F.col("doc_b") != 0))


def _n_components(pairs):
    return (connected_components(pairs).select("comp").distinct()
            .count())


def test_valve_secondary_hub_rescue_preserves_clusters(spark):
    """Satellites share all bands; the oversized all-satellite buckets
    star around a SATELLITE hub, so the cluster survives the valve.
    Measured for SCALE.md: pair recall (m-1)/C(m,2) = 39/780, cluster
    count identical to the exact pairer."""
    sigs = _sigs(spark, "band0")
    cand_v = lsh_candidate_pairs(sigs, max_bucket=10)
    cand_n = lsh_candidate_pairs(sigs, max_bucket=None)
    found_v = _verify(cand_v)
    found_n = _verify(cand_n)
    n_v, n_n = found_v.count(), found_n.count()
    assert n_n == N_SAT * (N_SAT - 1) // 2  # 780 true pairs
    assert n_v == N_SAT - 1, f"expected hub star, got {n_v}"
    # components over verified pairs: one satellite cluster either way
    assert _n_components(found_v) == 1
    assert _n_components(found_n) == 1


def test_valve_single_shared_band_loses_the_cluster(spark):
    """The measured worst case: the only bucket linking the satellites
    is the mixed one whose hub is the dissimilar core. Every star edge
    fails verification -> pair recall 0/780 and the cluster is gone.
    This is the cost the production max_bucket default accepts; its
    reach is bounded by P(bucket | j) ~ j^r per band (a j=0.5 pair
    co-buckets at ~6% per band), so a verified-pair-losing mixed
    bucket requires a low-similarity member to hash-collide into a
    full band — the regime note in lsh_candidate_pairs' docstring."""
    sigs = _sigs_single_shared_band(spark)
    cand_v = lsh_candidate_pairs(sigs, max_bucket=10)
    cand_n = lsh_candidate_pairs(sigs, max_bucket=None)
    # valve: star from the core hub only — no satellite-satellite edge
    assert cand_v.count() == N_SAT  # core->each satellite
    found_v = _verify(cand_v)
    found_n = _verify(cand_n)
    assert found_v.count() == 0, "mixed-bucket star edges must fail"
    assert found_n.count() == N_SAT * (N_SAT - 1) // 2
    assert _n_components(found_n) == 1


def test_cdc_edit_stability_beats_fixed_width(spark, sf_smoke):
    """The property dedup_cdc_edit_stability demonstrates: under a
    one-word mid-page edit, CDC chunking carries most chunks forward
    while fixed-width chunking shifts every window after the edit.
    Asserted as a mean gap, measured at sf0.001."""
    df = CATALOG["dedup_cdc_edit_stability"].fn(spark, sf_smoke)
    row = df.agg(F.avg("cdc_frac").alias("c"),
                 F.avg("fixed_frac").alias("f")).collect()[0]
    assert row["c"] > row["f"] + 0.15, (
        f"CDC stability gap too small: cdc={row['c']:.3f} "
        f"fixed={row['f']:.3f}")
    assert row["c"] > 0.6, f"CDC carried_frac too low: {row['c']:.3f}"


def test_valve_audit_entry_is_all_green_booleans(spark, sf_smoke):
    """The driver-facing valve audit must report engaged + lossless
    components on the uniform planted bucket at smoke scale too."""
    row = (CATALOG["dedup_star_valve_recall_audit"].fn(spark, sf_smoke)
           .collect()[0])
    assert row["star_engaged"]
    assert row["components_equal"]
    assert row["single_cluster"]
    assert row["n_true"] == row["n_planted"] * (row["n_planted"] - 1) / 2


def test_distill_student_mostly_agrees_with_teacher(spark, sf_smoke):
    """Distillation sanity: the token-log-odds student must recover
    the teacher's verdicts far above chance on the training corpus —
    otherwise the distillation entries are measuring noise."""
    rows = (CATALOG["quality_distill_student_agreement"]
            .fn(spark, sf_smoke).collect())
    agree = sum(r["n_docs"] for r in rows
                if r["teacher_keep"] == r["student_keep"])
    total = sum(r["n_docs"] for r in rows)
    assert agree * 10 >= total * 7, (
        f"student/teacher agreement {agree}/{total} below 70%")


@pytest.mark.parametrize("name", [
    "dedup_manifest_minhash", "dedup_cdc_cross_snapshot",
    "mix_token_budget_pacing", "web_host_crawl_budget",
    "embedding_quantization_recall"])
def test_r11_entries_partition_invariant(name, spark, sf_smoke):
    """Spot partition-invariance: results must not depend on input
    split count (the full-catalog sweep covers the rest)."""
    fn = CATALOG[name].fn
    a = {tuple(str(x) for x in r) for r in fn(spark, sf_smoke).collect()}
    n = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = {tuple(str(x) for x in r)
             for r in fn(spark, sf_smoke).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", n)
    assert a == b
