"""Guards on the driver contract (__spark_entry__):

* every oracle key has a query; rows-only set is the documented pair;
* every entry that still needs a driver-green refresh sits inside the
  driver's first-50 check window (round-4 rule: every new r4 operator
  plus the 27 entries whose last driver-green row was r1);
* no oracle SQL contains a bare long decimal literal (DuckDB would parse
  it as DECIMAL and drift 1 ulp on conversion — the E-notation rule in
  CLAUDE.md / fixtures._f).
"""

import re

import __spark_entry__ as E

#: the round-4 refresh window (VERDICT r3 "what's wrong" #2): every new
#: r4 operator + all 27 entries whose last driver-green row was r1 —
#: extend with new operators when adding queries.
ROUND4_WINDOW_OPS = [
    # round-4 additions
    "transform_lcc", "transform_albers", "transform_stereo",
    "group_season_custom", "transform_omerc", "ops_chain_lcc",
    "tfidf_top_terms", "chunk_spans", "bloom_decontaminate", "pq_topk",
    # r1-stale refresh batch (multifile_union and eval_expr — r1-green,
    # code untouched since r1 — gave their slots to the new
    # bloom_decontaminate and pq_topk; they sit just past the boundary
    # and rotate back in r5)
    # r4s8/s9 additions (fresh code): they took the slots of time_range,
    # time_region, group_month, set_functions, group_day (r1-green,
    # code untouched since r1; rotate back in r5)
    "bpe_train", "bpe_vocab", "bpe_segment", "bpe_encode", "gopher_rules",
    "multimodal_features", "top_tokens", "daily_perc_window",
    "chunk_documents", "clean_text", "train_test_split", "group_season",
    "duration", "freq_duration", "heat_index",
    "icclim_CDD",
    "intersects_multi", "ops_facade", "zonal_stats",
    # r4s9/s10 additions (fresh code): they took the slots of
    # moving_window, between_threshold, convolve, freq_perc,
    # snippet_first, icclim_SU (r1-green, code untouched since r1;
    # rotate back in r5 — see PLANS.md r5 backlog)
    "url_canon", "url_dedup", "domain_caps", "scrub_spans", "media_dedup",
    "zrange_subset",
]

#: 11+ digits after the decimal point NOT followed by an exponent marker
_BARE_LONG_FLOAT = re.compile(r"\d+\.\d{11,}(?![0-9eE])")


def test_oracles_subset_of_queries():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    rows_only = set(qs) - set(os_)
    assert rows_only == set()  # every query has an exact oracle


def test_round6_window_policy():
    """The r6 driver window (VERDICT r5 ask #3, adapted to the
    optimization round): the two r5 driver reds lead (their Spark-side
    signed-zero fixes are the round's proof obligation), the r6-changed
    previously-green entries follow (optimization regressions must be
    driver-visible), and the rest is never-driver-checked backlog in
    manifest order. Every R5_WINDOW / r4-window name must still be
    registered (gated by check_oracles/check_strict + pytest while
    outside the window)."""
    order = list(E.queries())
    win = E.R6_WINDOW
    assert len(win) == 50
    assert order[: len(win)] == win
    assert win[:2] == ["lisa_bivariate", "seasonal_decompose"]
    changed = {"pii_scan", "spacetime_scan", "knn_point",
               "tile_source_assign", "url_canon", "triangle_stats",
               "radius_join", "dwell_segments", "od_flows"}
    assert changed <= set(win)
    for prev in (E.R5_WINDOW, ROUND4_WINDOW_OPS):
        missing = [n for n in prev if n not in order]
        assert missing == []


def test_no_bare_long_float_literals_in_oracles():
    offenders = {}
    for name, sql in E.oracle_sql().items():
        hits = _BARE_LONG_FLOAT.findall(sql)
        if hits:
            offenders[name] = hits[:3]
    assert not offenders, f"bare long decimal literals (use _f/E0): {offenders}"


#: entries whose plans legitimately contain ARROW-batched Python (the
#: NumPy geometry kernel's exact refine/clip, PQ/IVF encode, multimodal
#: decode plumbing) — every one is a vectorized pandas/Arrow eval, never
#: row-at-a-time. New entries may only join this list with a PLANS.md
#: audit explaining why the kernel can't be Catalyst columns.
ARROW_ALLOWED = {
    "multimodal_features", "pq_topk", "zrange_subset",
    "agg_selection_clip_convex", "agg_selection_clip_concave",
    "agg_selection_clip_holed", "ivf_topk", "ivfpq_topk",
    "union_geometry", "curvilinear_clip", "nonconvex_clip",
    "unstructured_subset", "nonconvex_intersects",
    "bbox_subset_nonuniform", "clip_cells_nonuniform",
    "embedding_near_dups_ivf", "agg_selection_clip",
    "intersects_pentagon_nonuniform", "knn_point_nonuniform",
    "zonal_stats_nonuniform", "zonal_weighted_nonuniform",
    "tile_dest_counts_nonuniform", "tile_source_assign_nonuniform",
}


def test_registry_wide_no_row_python(spark):
    """Sweeping plan guard over EVERY registry entry at sf0.001: no query
    may plan a row-at-a-time BatchEvalPython, and Arrow-batched Python is
    confined to the documented geometry/PQ/multimodal allowlist. Catches
    a hot-path regression (an F.udf slipping into a shared helper) across
    all 160+ entries at once. Planning only — results are never
    collected, so the cost is plan compilation plus the bounded
    driver-side preps some builders run (~2 min at local[8])."""
    sf = "/root/testdata/sf0.001"
    row_bad, arrow_bad = [], []
    for name, fn in E.queries().items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            row_bad.append(name)
        if (
            "ArrowEvalPython" in plan
            or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
        ) and name not in ARROW_ALLOWED:
            arrow_bad.append(name)
    assert row_bad == [], f"row-at-a-time Python in hot paths: {row_bad}"
    assert arrow_bad == [], f"undocumented Arrow eval: {arrow_bad}"
