"""Declarative expectations: one-pass report semantics, NULL
contract, row-level enforcement reconciliation, and the
write-audit-publish gate over the snapshot catalog."""

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.operators.expectations import (
    Expectation,
    audit_branch,
    enforce_expectations,
    expect_in_range,
    expect_in_set,
    expect_matches,
    expect_not_null,
    expect_sql,
    expect_unique,
    expectation_report,
    publish_if_valid,
)


@pytest.fixture()
def frame(spark):
    rows = [
        # (id, lang, score, url)
        (1, "en", 0.9, "https://a.example"),
        (2, "en", 1.7, "https://b.example"),   # score out of range
        (3, None, 0.5, "ftp://weird"),         # lang NULL + url no match
        (4, "de", None, None),                 # score/url NULL (pass shape rules)
        (2, "fr", 0.1, "https://c.example"),   # duplicate id
        (5, "xx", 0.2, "https://d.example"),   # lang outside set
    ]
    return spark.createDataFrame(
        rows, "id int, lang string, score double, url string")


def _rules():
    # built lazily: Column construction needs an active SparkSession
    return [
        expect_not_null("lang"),
        expect_in_range("score", 0.0, 1.0),
        expect_matches("url", r"^https://"),
        expect_in_set("lang", ["en", "de", "fr"]),
        expect_unique("id"),
    ]


def _report_map(df):
    return {r["rule"]: r.asDict() for r in df.collect()}


class TestReport:
    def test_counts_and_null_contract(self, frame):
        rep = _report_map(expectation_report(frame, _rules()))
        assert rep["lang_not_null"]["n_violations"] == 1
        # NULL score/url PASS the shape rules
        assert rep["score_in_range"]["n_violations"] == 1
        assert rep["url_matches"]["n_violations"] == 1
        # NULL lang passes in_set (missingness is not_null's job)
        assert rep["lang_in_set"]["n_violations"] == 1
        # unique: 6 non-null ids, 5 distinct -> 1 surplus copy
        assert rep["id_unique"]["n_evaluated"] == 6
        assert rep["id_unique"]["n_violations"] == 1
        for r in rep.values():
            if r["rule"] != "id_unique":
                assert r["n_evaluated"] == 6
            assert r["passed"] == (r["n_violations"] == 0)

    def test_fail_fraction_threshold(self, frame):
        rep = _report_map(expectation_report(
            frame, [expect_not_null("lang", max_fail_fraction=0.2)]))
        r = rep["lang_not_null"]
        assert r["fail_fraction"] == pytest.approx(1 / 6, abs=1e-6)
        assert r["passed"]  # 0.1667 <= 0.2

    def test_sql_null_is_failure(self, frame):
        # score > 0.0 is NULL for the NULL score row -> strict failure
        rep = _report_map(expectation_report(
            frame, [expect_sql("score_pos", "score > 0.0")]))
        assert rep["score_pos"]["n_violations"] == 1

    def test_empty_table_passes(self, frame):
        rep = _report_map(expectation_report(frame.limit(0), _rules()))
        assert all(r["passed"] for r in rep.values())
        assert all(r["n_violations"] == 0 for r in rep.values())

    def test_duplicate_names_rejected(self, frame):
        with pytest.raises(ValueError, match="duplicate"):
            expectation_report(
                frame, [expect_not_null("lang"), expect_not_null("lang")])

    def test_single_job_single_aggregate(self, frame):
        # row-rules-only report: ONE aggregate pair, ONE exchange
        row_rules = [r for r in _rules() if r.predicate is not None]
        plan = expectation_report(frame, row_rules)._jdf \
            .queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1


class TestEnforce:
    def test_partition_and_reasons(self, frame):
        row_rules = [r for r in _rules() if r.predicate is not None]
        clean, quar = enforce_expectations(frame, row_rules)
        assert clean.count() + quar.count() == frame.count()
        assert clean.columns == frame.columns
        reasons = {r["id"]: sorted(r["failed_expectations"])
                   for r in quar.collect()}
        assert reasons[3] == ["lang_not_null", "url_matches"]
        assert reasons[5] == ["lang_in_set"]
        assert 2 in reasons  # the out-of-range score copy
        assert 4 not in reasons  # NULLs pass shape rules
        assert 1 not in reasons

    def test_table_level_rule_rejected(self, frame):
        with pytest.raises(ValueError, match="table-level"):
            enforce_expectations(frame, [expect_unique("id")])

    def test_no_shuffle(self, frame):
        row_rules = [r for r in _rules() if r.predicate is not None]
        clean, quar = enforce_expectations(frame, row_rules)
        for df in (clean, quar):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan


class TestValidation:
    def test_bad_constructor_args(self, spark):
        with pytest.raises(ValueError, match="exactly one"):
            Expectation("x")
        with pytest.raises(ValueError, match="exactly one"):
            Expectation("x", predicate=F.lit(True), unique_col="id")
        with pytest.raises(ValueError, match="max_fail_fraction"):
            expect_not_null("lang", max_fail_fraction=1.0)


class TestWapGate:
    def _table(self, tmp_path, spark, frame):
        from mehc_curation_spark.io.catalog import SnapshotTable

        t = SnapshotTable(str(tmp_path / "tbl"))
        t.write(frame.filter("id = 1"), mode="overwrite")
        return t

    def test_publish_refused_on_failing_audit(self, tmp_path, spark, frame):
        t = self._table(tmp_path, spark, frame)
        t.create_branch("audit")
        t.write(frame, mode="overwrite", branch="audit")
        ok, report = audit_branch(t, spark, "audit",
                                  [expect_not_null("lang")])
        assert not ok
        main_before = t.resolve_ref("main")
        with pytest.raises(ValueError, match="lang_not_null"):
            publish_if_valid(t, spark, "audit",
                             [expect_not_null("lang")])
        assert t.resolve_ref("main") == main_before  # main untouched
        # the staged branch stays readable for inspection
        assert t.read(spark, version="audit").count() == frame.count()

    def test_publish_advances_on_passing_audit(self, tmp_path, spark, frame):
        t = self._table(tmp_path, spark, frame)
        t.create_branch("audit")
        good = frame.filter("lang IS NOT NULL")
        t.write(good, mode="overwrite", branch="audit")
        v = publish_if_valid(t, spark, "audit",
                             [expect_not_null("lang")])
        assert t.resolve_ref("main") == v
        assert t.read(spark).count() == good.count()
