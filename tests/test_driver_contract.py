"""Guards on the driver contract (__spark_entry__):

* every oracle key has a query; rows-only set is the documented pair;
* every round-2 operator sits inside the driver's first-50 check window;
* no oracle SQL contains a bare long decimal literal (DuckDB would parse
  it as DECIMAL and drift 1 ulp on conversion — the E-notation rule in
  CLAUDE.md / fixtures._f).
"""

import re

import __spark_entry__ as E

ROUND2_OPS = [
    "bbox_subset_nonuniform", "clip_cells_nonuniform",
    "intersects_pentagon_nonuniform", "curvilinear_subset",
    "curvilinear_clip", "rotated_pole_subset", "seam_subset",
    "union_geometry", "agg_selection", "icclim_TX90p", "icclim_RX5day",
    "icclim_HD17", "cf_decode_360day", "cf_noleap_group",
    "tile_dest_counts_nonuniform", "tile_source_assign_nonuniform",
    "split_selection", "regrid_nonuniform", "knn_point_nonuniform",
    "dedup_components", "fuzzy_dedup_e2e", "decontaminate",
    "repetition_ratio", "embedding_near_dups_ivf", "zonal_stats_nonuniform",
    "cf_daily_perc_360", "zonal_weighted_nonuniform",
]

#: 11+ digits after the decimal point NOT followed by an exponent marker
_BARE_LONG_FLOAT = re.compile(r"\d+\.\d{11,}(?![0-9eE])")


def test_oracles_subset_of_queries():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    rows_only = set(qs) - set(os_)
    assert rows_only == {"curvilinear_clip", "freezethaw"}


def test_round2_ops_inside_driver_window():
    order = list(E.queries())
    late = [n for n in ROUND2_OPS if order.index(n) >= 50]
    assert late == [], f"round-2 ops outside the first-50 window: {late}"


def test_no_bare_long_float_literals_in_oracles():
    offenders = {}
    for name, sql in E.oracle_sql().items():
        hits = _BARE_LONG_FLOAT.findall(sql)
        if hits:
            offenders[name] = hits[:3]
    assert not offenders, f"bare long decimal literals (use _f/E0): {offenders}"
