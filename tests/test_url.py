"""URL/provenance arc (round 8): normalization fixed points, registered
-domain extraction under the inlined public-suffix excerpt, and the
dedup/blocklist accounting invariants."""

from pyspark.sql import functions as F

from diepy_spark.plans.extended import (
    URL_BLOCKLIST,
    _url_frame,
    x2_url_dedup,
    x5_domain_blocklist,
    x5_domain_rollup,
)


def _frame_rows(spark, sf_dir, ids):
    u = _url_frame(spark, sf_dir).where(F.col("doc_id").isin(ids))
    return {r.doc_id: r for r in u.collect()}


def test_normalize_fixed_points(spark, sf_small):
    rows = _frame_rows(spark, sf_small, [0, 1, 2, 3, 37])
    # doc 0: every messy feature at once — scheme case, WWW, default
    # port, trailing slash, fragment.
    assert rows[0].url_raw == "HTTPS://WWW.cdn.Site0.co.uk:443/p/0/#frag"
    assert rows[0].url_norm == "https://cdn.site0.co.uk/p/0"
    assert rows[0].domain == "site0.co.uk"
    # doc 2: tracking query stripped entirely.
    assert "?utm_" in rows[2].url_raw
    assert "?" not in rows[2].url_norm
    # doc 37: subdomain kept in url_norm, stripped from domain.
    assert rows[37].url_norm == "https://cdn.site3.io/p/2"
    assert rows[37].host == "cdn.site3.io"
    assert rows[37].domain == "site3.io"
    # 2-label registered domain under a 1-label suffix.
    assert rows[1].domain == "site1.com"


def test_registered_domain_psl(spark, sf_small):
    u = _url_frame(spark, sf_small)
    got = {
        (r.host, r.domain)
        for r in u.select("host", "domain").distinct().collect()
    }
    for host, dom in got:
        assert not dom.startswith("cdn."), (host, dom)
        if host.endswith(".co.uk"):
            assert dom.count(".") == 2, (host, dom)
        else:
            assert dom.count(".") == 1, (host, dom)


def test_url_dedup_invariants(spark, sf_oracle):
    rows = x2_url_dedup(spark, sf_oracle).collect()
    assert rows, "no domains"
    for r in rows:
        assert r.n_docs == r.n_urls + r.n_dup_docs
        assert r.n_urls <= 7  # path cycle bound per domain
    # sf0.01 has 500 docs over a 119-key URL space: dups must exist.
    assert sum(r.n_dup_docs for r in rows) > 0


def test_blocklist_gate(spark, sf_oracle):
    rows = x5_domain_blocklist(spark, sf_oracle).collect()
    total_blocked = sum(r.n_blocked for r in rows)
    assert total_blocked > 0
    # blocked share ~= 4 blocked hosts / 17 (doc_id uniform mod 17)
    total = sum(r.n_kept + r.n_blocked for r in rows)
    assert abs(total_blocked / total - len(URL_BLOCKLIST) / 17) < 0.05
    dom = dict(
        x5_domain_rollup(spark, sf_oracle)
        .select("domain", "n_docs")
        .collect()
    )
    assert set(URL_BLOCKLIST) <= set(dom), "blocklist names real domains"
