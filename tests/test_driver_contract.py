"""Guards on the driver contract (__spark_entry__):

* every oracle key has a query; rows-only set is the documented pair;
* every entry that still needs a driver-green row sits inside the
  driver's first-50 check window (round-3 rule: the 11 veterans that were
  never driver-checked, the r2 red row, and every new round-3 operator);
* no oracle SQL contains a bare long decimal literal (DuckDB would parse
  it as DECIMAL and drift 1 ulp on conversion — the E-notation rule in
  CLAUDE.md / fixtures._f).
"""

import re

import __spark_entry__ as E

#: entries with no driver-green row in CORRECTNESS_r01 ∪ r02 (VERDICT r2
#: "what's wrong" #3 veterans + the curvilinear_clip red row), plus every
#: operator ADDED in round 3 — extend this list when adding queries.
ROUND3_WINDOW_OPS = [
    "curvilinear_clip",
    "zonal_weighted", "knn_join", "regrid", "units_conform", "wrap_lon",
    "daily_perc", "q1_pricing", "freezethaw", "nonconvex_clip",
    "unstructured_subset", "join_agg",
    # round-3 additions
    "icclim_WSDI", "icclim_CSDI", "icclim_R95p", "icclim_R95pTOT",
    "icclim_TXx", "transform_mercator", "agg_selection_clip",
    "dedup_components_star", "ops_chain", "asof_calibration",
    "range_join_density", "frame_sample_plan", "simhash_near_dups",
    "pii_scan", "word_entropy", "stratified_sample", "regrid_bilinear",
    "nonconvex_intersects", "regrid_bilinear_nonuniform", "lexicon_score",
    "pack_sequences", "corpus_pipeline",
]

#: 11+ digits after the decimal point NOT followed by an exponent marker
_BARE_LONG_FLOAT = re.compile(r"\d+\.\d{11,}(?![0-9eE])")


def test_oracles_subset_of_queries():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    rows_only = set(qs) - set(os_)
    assert rows_only == set()  # every query has an exact oracle


def test_round3_ops_inside_driver_window():
    order = list(E.queries())
    late = [n for n in ROUND3_WINDOW_OPS if order.index(n) >= 50]
    assert late == [], f"round-3 ops outside the first-50 window: {late}"


def test_no_bare_long_float_literals_in_oracles():
    offenders = {}
    for name, sql in E.oracle_sql().items():
        hits = _BARE_LONG_FLOAT.findall(sql)
        if hits:
            offenders[name] = hits[:3]
    assert not offenders, f"bare long decimal literals (use _f/E0): {offenders}"
