"""URL canonicalization / url-dedup / domain-cap operators (urls.py).

Covers the handcrafted normalization contract (cases the synthesized
corpus can't isolate), canonicalization idempotence, partitioning
independence of the deterministic cap, and the plan shapes (canon = pure
codegen projection; cap = exactly one window shuffle)."""

from pyspark.sql import functions as F

from ocgis_spark.operators import urls


def _canon_map(spark, raw_urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(raw_urls)], "doc_id long, url string"
    )
    out = urls.canonicalize(df).select("url", "canon_url", "host", "domain")
    return {r["url"]: r for r in out.collect()}


def test_handcrafted_normalization(spark):
    cases = {
        # mixed case + www + default port + fragment all normalize away
        "HTTPS://WWW.Ex.COM:443/A/b?id=1#frag":
            ("https://ex.com/A/b?id=1", "ex.com", "ex.com"),
        # http default port
        "http://www.ex.com:80/a": ("http://ex.com/a", "ex.com", "ex.com"),
        # NON-default port survives in canon_url but not in host
        "https://ex.com:8080/a": ("https://ex.com:8080/a", "ex.com", "ex.com"),
        # path case is preserved; only scheme+host fold
        "https://EX.com/CaseY": ("https://ex.com/CaseY", "ex.com", "ex.com"),
        # utm params stripped; '?' re-punctuated onto the survivor
        "https://ex.com/a?utm_source=x&id=2":
            ("https://ex.com/a?id=2", "ex.com", "ex.com"),
        "https://ex.com/a?id=2&utm_medium=y":
            ("https://ex.com/a?id=2", "ex.com", "ex.com"),
        # all-tracking query -> dangling '?' dropped, then trailing '/'
        "https://ex.com/a/?utm_campaign=z":
            ("https://ex.com/a", "ex.com", "ex.com"),
        # a lookalike param name is NOT stripped
        "https://ex.com/a?xutm_source=1":
            ("https://ex.com/a?xutm_source=1", "ex.com", "ex.com"),
        # one trailing slash dropped (and only one)
        "https://ex.com/a//": ("https://ex.com/a/", "ex.com", "ex.com"),
        # multi-part public suffix keeps three labels
        "https://news.bbc.co.uk/x":
            ("https://news.bbc.co.uk/x", "news.bbc.co.uk", "bbc.co.uk"),
        # plain suffix keeps two
        "https://a.b.example.org/x":
            ("https://a.b.example.org/x", "a.b.example.org", "example.org"),
        # single-label host: domain falls back to the host itself
        "http://localhost:8000/health":
            ("http://localhost:8000/health", "localhost", "localhost"),
        # scheme-less input: passes through with host = domain = '' (the
        # documented "unparseable" signal; see the module contract)
        "ex.com/path": ("ex.com/path", "", ""),
    }
    got = _canon_map(spark, list(cases))
    for raw, (canon, host, domain) in cases.items():
        r = got[raw]
        assert r["canon_url"] == canon, raw
        assert r["host"] == host, raw
        assert r["domain"] == domain, raw


def test_canonicalization_idempotent(spark):
    # Compare via collected dicts, NOT a filter-above-self-join: an
    # inequality filter over a self-join of two deep projection chains
    # sends Catalyst constraint propagation (InferFiltersFromConstraints)
    # into a combinatorial blowup — the OPTIMIZER hangs before any row
    # moves (measured: optimizedPlan() alone exceeds 5 min; each side
    # plans and runs in <1 s). See PLANS.md r4s9.
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.expr(urls.url_synth_sql("id")).alias("url"),
    )
    once = urls.canonicalize(docs).select(
        "doc_id", F.col("canon_url").alias("url"))
    first = {r["doc_id"]: r["url"] for r in once.collect()}
    second = {
        r["doc_id"]: r["canon_url"]
        for r in urls.canonicalize(once).select("doc_id", "canon_url").collect()
    }
    assert first == second


def test_canonicalize_plan_is_pure_codegen(spark):
    docs = spark.range(0, 10).select(
        F.col("id").alias("doc_id"),
        F.expr(urls.url_synth_sql("id")).alias("url"),
    )
    plan = (
        urls.canonicalize(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_domain_cap_one_shuffle_and_bound(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.expr(urls.url_synth_sql("id")).alias("url"),
    )
    capped = urls.domain_cap(urls.canonicalize(docs), cap=5)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:2000]
    per = capped.groupBy("domain").count().collect()
    assert per and all(r["count"] <= 5 for r in per)


def test_domain_cap_partitioning_independent(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.expr(urls.url_synth_sql("id")).alias("url"),
    )
    canon = urls.canonicalize(docs)
    kept_a = sorted(
        r["doc_id"] for r in urls.domain_cap(canon, cap=5).collect()
    )
    kept_b = sorted(
        r["doc_id"]
        for r in urls.domain_cap(canon.repartition(17), cap=5).collect()
    )
    assert kept_a == kept_b


def test_url_dedup_first_crawl_wins(spark):
    # doc_ids 0..599 over a 60-periodic synth URL: canon groups are the
    # residues mod 60, so the kept set is exactly 0..59
    docs = spark.range(0, 600).select(
        F.col("id").alias("doc_id"),
        F.expr(urls.url_synth_sql("id")).alias("url"),
    )
    kept = sorted(r["doc_id"] for r in urls.url_dedup(docs).collect())
    assert kept == list(range(60))


def test_canonicalization_invariants_fuzz(spark):
    """Grammar fuzz (seeded): canon output never carries a fragment, a
    default port, a www. prefix, a utm_ param, a dangling '?', or a
    trailing '/'; host never carries a port; domain is always a suffix of
    host; and canonicalization is idempotent on every fuzzed input."""
    import random

    rng = random.Random(20260818)
    schemes = ["http://", "https://", "HTTP://", "HTTPS://"]
    hosts = ["Ex.COM", "a.b.Example.ORG", "news.bbc.CO.UK", "localhost",
             "www.site.com", "WWW.deep.sub.site.net", "x.co"]
    ports = ["", ":443", ":80", ":8080"]
    paths = ["", "/", "/a", "/a/b", "/A/B/", "/p//q"]
    queries = ["", "?id=1", "?utm_source=x", "?utm_source=x&id=2",
               "?id=2&utm_medium=y&utm_term=z", "?a=1&b=2"]
    frags = ["", "#f", "#sec/2?x=1"]
    urls_raw = list({
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(400)
    })
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls_raw)], "doc_id long, url string"
    )
    out = urls.canonicalize(df).select("url", "canon_url", "host", "domain")
    rows = out.collect()
    for r in rows:
        c, h, d = r["canon_url"], r["host"], r["domain"]
        assert "#" not in c, r
        assert not c.endswith("/") and not c.endswith("?"), r
        assert "utm_" not in c, r
        # default ports are scheme-specific: :443 only folds on https,
        # :80 only on http (the fuzz caught an over-broad first draft of
        # this assertion — http://host:443 legitimately keeps its port)
        hp = c.split("/")[2] if "://" in c else ""
        if c.startswith("https://"):
            assert not hp.endswith(":443"), r
        if c.startswith("http://"):
            assert not hp.endswith(":80"), r
        assert ":" not in h, r
        assert h == h.lower() and not h.startswith("www."), r
        assert d == "" or h == d or h.endswith("." + d), r
    # idempotence over the whole fuzz corpus (collected compare — see the
    # PLANS.md r4s9 self-join hazard)
    once = {r["url"]: r["canon_url"] for r in rows}
    df2 = spark.createDataFrame(
        [(i, c) for i, c in enumerate(sorted(set(once.values())))],
        "doc_id long, url string",
    )
    again = {
        r["url"]: r["canon_url"]
        for r in urls.canonicalize(df2).select("url", "canon_url").collect()
    }
    for c, c2 in again.items():
        assert c2 == c, (c, c2)


def test_canonicalize_gated_equals_staged_strings(spark):
    """The r6 instr-gated Spark pipeline must equal the ungated
    canon_stage_exprs strings row-for-row — including adversarial
    inputs engineered so a UTM deletion would have to splice a
    tracking-name literal into existence for the gate to be wrong."""
    from pyspark.sql import functions as F

    cases = [
        "HTTPS://WWW.Host1.Ex2.COM:443/p/3?utm_source=a&utm_medium=b#f",
        "http://h.ex.co.uk/p?id=1",
        "http://h.ex.com/p?utm_campaign=z",
        "http://h.ex.com/p/?utm_source=news&id=2",
        "http://h.ex.com/p?id=ut&utm_medium=Xm_source=1",
        "http://h.ex.com/p?xutm_sour&ce=1&utm_term=t",
        "http://h.ex.com/p?utm_source=a?utm_medium=b",
        "http://h.ex.com/p?utm_term=&utm_content=z",
        "http://utm_source.ex.com/p#frag#frag2",
        "not-a-url-no-scheme utm_source=x # y",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "doc_id long, url string"
    )
    ref = docs
    for name, expr in urls.canon_stage_exprs("url"):
        ref = ref.withColumn(name, F.expr(expr))
    want = {
        r["doc_id"]: r
        for r in ref.select("doc_id", "canon_url", "host", "domain")
        .collect()
    }
    got = {
        r["doc_id"]: r
        for r in urls.canonicalize(docs)
        .select("doc_id", "canon_url", "host", "domain").collect()
    }
    assert set(got) == set(want)
    for k in want:
        for c in ("canon_url", "host", "domain"):
            assert got[k][c] == want[k][c], (k, c, got[k][c], want[k][c])
