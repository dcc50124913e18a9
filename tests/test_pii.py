"""PII detection / redaction / filtering (operators/pii): planted
examples per kind, redaction-order interplay (card vs phone vs ipv4),
whole-pipeline plan purity (no Python, no shuffle), and the clean-corpus
filter. Driver oracles ``pii_report`` / ``pii_redact`` pin the patterns
against DuckDB's RE2 at sf0.01."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.pii import (  # noqa: E402
    pii_filter, pii_report, redact_pii,
)

DOCS = [
    (1, "reach me at jane.doe+spam@corp.example.org thanks"),
    (2, "server at 192.168.0.1 and backup 10.0.0.2"),
    (3, "ssn is 123-45-6789, call 555-867-5309"),
    (4, "card 4111-1111-1111-1111 exp 11/28"),
    (5, "no pii here, just 3.14 and v1.2.3 and a-b-c"),
    (6, "two mails: a@b.io and c.d@e.f.gov"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_detection_counts_per_kind(spark):
    rep = {r.doc_id: r for r in pii_report(_docs(spark)).collect()}
    assert (rep[1].n_email, rep[1].n_pii) == (1, 1)
    assert rep[2].n_ipv4 == 2
    assert (rep[3].n_ssn, rep[3].n_phone) == (1, 1)
    assert rep[4].n_card == 1
    # the card must NOT also count as phone/ssn/ipv4 fragments
    assert rep[4].n_pii == 1
    assert not rep[5].has_pii and rep[5].n_pii == 0
    assert rep[6].n_email == 2


def test_redaction_replaces_and_preserves(spark):
    out = {r.doc_id: r.text for r in redact_pii(_docs(spark)).collect()}
    assert out[1] == "reach me at <EMAIL> thanks"
    assert out[2] == "server at <IPV4> and backup <IPV4>"
    assert out[3] == "ssn is <SSN>, call <PHONE>"
    # redaction order: the whole card goes, not a phone-shaped chunk
    assert out[4] == "card <CARD> exp 11/28"
    assert out[5] == DOCS[4][1]          # untouched
    assert out[6] == "two mails: <EMAIL> and <EMAIL>"


def test_filter_drops_only_offenders(spark):
    kept = sorted(r.doc_id for r in pii_filter(_docs(spark)).collect())
    assert kept == [5]
    lax = sorted(r.doc_id for r in
                 pii_filter(_docs(spark), max_hits=1).collect())
    # docs 2 (2 ips), 3 (ssn+phone) and 6 (2 emails) exceed one hit
    assert lax == [1, 4, 5]


def test_plan_is_pure_codegen(spark):
    plan = pii_report(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "EvalPython", "BatchEvalPython"):
        assert bad not in plan, plan
