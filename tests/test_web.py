"""URL curation (operators/web.py): normalization cases, domain
extraction, deterministic per-domain quotas, plan purity."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from openapi_to_rdf_spark.operators.web import (  # noqa: E402
    domain_quota_sample, host_of, normalize_url, registrable_domain,
    url_features)


def _norm(spark, *urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r.n for r in
            df.select(normalize_url(F.col("url")).alias("n")).collect()]


def test_normalize_cases(spark):
    got = _norm(
        spark,
        "HTTP://Example.COM:80/a//b/?z=1&a=2#frag",
        "https://site.org:443/path/",
        "https://site.org/",
        "http://h.com/p?utm_source=x&q=1&utm_medium=y",
        "http://h.com/p?utm_source=x",
        "http://h.com/p?gclid=abc&b=2",
        "http://plain.com/keep?b=2&a=1",
    )
    assert got == [
        "http://example.com/a/b?a=2&z=1",
        "https://site.org/path",
        "https://site.org/",
        "http://h.com/p?q=1",
        "http://h.com/p",
        "http://h.com/p?b=2",
        "http://plain.com/keep?a=1&b=2",
    ]


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [("https://user@WWW.News.BBC.co.uk:8443/x",),
         ("http://a.b.example.com/",),
         ("http://localhost/",),
         ("http://example.com/",)], ["url"])
    rows = df.select(host_of(F.col("url")).alias("h")).collect()
    hosts = [r.h for r in rows]
    assert hosts == ["www.news.bbc.co.uk", "a.b.example.com", "localhost",
                     "example.com"]
    doms = [r.d for r in df.select(
        registrable_domain(host_of(F.col("url"))).alias("d")).collect()]
    assert doms == ["bbc.co.uk", "example.com", "localhost", "example.com"]


def test_quota_is_deterministic_and_append_stable(spark):
    urls = [(f"http://d{i % 3}.com/page{j}",)
            for i in range(3) for j in range(10)]
    df = spark.createDataFrame(urls, ["url"])
    kept = domain_quota_sample(df, quota=4)
    assert kept.groupBy("domain").count().agg(
        F.max("count")).first()[0] == 4
    kept_set = {r.url_norm for r in kept.collect()}
    # append-stability: growing the corpus never evicts a kept URL in
    # favor of an md5-later one — rerun on a superset, the original
    # domain's kept set is a subset decision on the same ranks
    df2 = df.unionAll(spark.createDataFrame(
        [("http://d9.com/x",)], ["url"]))
    kept2 = {r.url_norm for r in domain_quota_sample(df2, 4).collect()}
    assert kept_set <= kept2


def test_url_features_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("http://a.com/x",)], ["url"])
    plan = url_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
