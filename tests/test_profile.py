"""Unit tests for the one-pass column profiler (operators/profile.py)."""

from mehc_curation_spark.operators.profile import profile_columns


def _by_col(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_profile_counts_and_minmax(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, None), (10, "b"), (10, "aa")],
        "id long, s string")
    p = _by_col(profile_columns(df))
    assert p["id"]["n_rows"] == 4 and p["id"]["n_nulls"] == 0
    assert p["id"]["n_distinct"] == 3
    # native-typed ordering: numeric max is 10, not lexicographic '2'
    assert p["id"]["min_val"] == "1" and p["id"]["max_val"] == "10"
    assert p["s"]["n_nulls"] == 1 and p["s"]["n_distinct"] == 2
    assert p["s"]["avg_len"] == round((2 + 1 + 2) / 3, 6)


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    p = _by_col(profile_columns(df))
    assert p["x"]["n_nulls"] == 2 and p["x"]["n_distinct"] == 0
    assert p["x"]["min_val"] is None and p["x"]["avg_len"] is None


def test_profile_approx_path_runs(spark):
    df = spark.range(100).withColumnRenamed("id", "v")
    p = _by_col(profile_columns(df, exact_distinct=False))
    # HLL++ estimate on 100 small ints is exact-ish; allow slack
    assert abs(p["v"]["n_distinct"] - 100) <= 5


def test_profile_single_scan_plan(spark):
    df = spark.range(10).selectExpr("id", "cast(id as string) s")
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range") == 1  # one scan feeds the whole profile


class TestScoreDrift:
    def _df(self, spark, vals):
        return spark.createDataFrame([(i, float(v)) for i, v in
                                      enumerate(vals)],
                                     "id long, s double")

    def test_identical_distributions_zero_psi(self, spark):
        from mehc_curation_spark.operators.profile import score_drift

        vals = [float(v) for v in range(100)]
        got = score_drift(self._df(spark, vals), self._df(spark, vals),
                          "s").collect()
        assert len(got) == 10
        assert all(r["psi_contrib"] == 0.0 for r in got)
        assert all(r["n_ref"] == r["n_new"] == 10 for r in got)

    def test_shifted_distribution_positive_psi(self, spark):
        from mehc_curation_spark.operators.profile import score_drift

        ref = self._df(spark, range(100))
        new = self._df(spark, [v + 200 for v in range(100)])
        got = score_drift(ref, new, "s").collect()
        psi = sum(r["psi_contrib"] for r in got)
        assert psi > 0.25  # "investigate" territory
        # out-of-range new scores clamp into the TOP edge bucket
        assert got[9]["n_new"] == 100

    def test_closed_form_two_buckets(self, spark):
        import math

        from mehc_curation_spark.operators.profile import score_drift

        ref = self._df(spark, [0.0, 0.0, 0.0, 1.0])   # 3 low, 1 high
        new = self._df(spark, [0.0, 1.0, 1.0, 1.0])   # 1 low, 3 high
        got = {r["bucket"]: r for r in
               score_drift(ref, new, "s", n_buckets=2).collect()}
        pr0, pn0 = 4 / 6, 2 / 6   # add-one smoothed (cnt+1)/(4+2)
        assert got[0]["psi_contrib"] == round(
            (pr0 - pn0) * math.log(pr0 / pn0), 6)
        assert got[0]["p_ref"] == round(pr0, 6)

    def test_null_scores_excluded_and_constant_ref(self, spark):
        from mehc_curation_spark.operators.profile import score_drift

        ref = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, None)],
                                    "id long, s double")
        new = spark.createDataFrame([(1, 5.0), (2, None)],
                                    "id long, s double")
        got = score_drift(ref, new, "s").collect()
        assert sum(r["n_ref"] for r in got) == 2
        assert sum(r["n_new"] for r in got) == 1

    def test_validation(self, spark):
        import pytest as _pt

        from mehc_curation_spark.operators.profile import score_drift

        df = self._df(spark, [1.0])
        with _pt.raises(ValueError, match="n_buckets"):
            score_drift(df, df, "s", n_buckets=1)
        empty = spark.createDataFrame([(1, None)], "id long, s double")
        with _pt.raises(ValueError, match="no non-NULL"):
            score_drift(empty, df, "s")


class TestCategoryDrift:
    def _df(self, spark, vals):
        return spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                     "id long, c string")

    def test_identical_distributions_zero_psi(self, spark):
        from mehc_curation_spark.operators.profile import category_drift

        vals = ["en"] * 50 + ["fr"] * 30 + ["de"] * 20
        got = category_drift(self._df(spark, vals), self._df(spark, vals),
                             "c", top_k=3).collect()
        # axis = 3 top categories + __other__
        assert [r["category"] for r in got][:3] == ["en", "fr", "de"]
        assert {r["category"] for r in got} == {"en", "fr", "de",
                                                "__other__"}
        assert all(r["psi_contrib"] == 0.0 for r in got)

    def test_tail_pools_into_other(self, spark):
        from mehc_curation_spark.operators.profile import category_drift

        ref = ["a"] * 10 + ["b"] * 8 + ["c"] * 4 + ["d"] * 2 + ["e"]
        new = ["a"] * 10 + ["b"] * 8 + ["c"] * 4 + ["x"] * 3
        got = {r["category"]: r for r in
               category_drift(self._df(spark, ref), self._df(spark, new),
                              "c", top_k=3).collect()}
        assert got["__other__"]["n_ref"] == 3   # d, d, e
        assert got["__other__"]["n_new"] == 3   # x, x, x
        # a new-only category never creates an axis row of its own
        assert "x" not in got and "d" not in got

    def test_null_is_its_own_category(self, spark):
        from mehc_curation_spark.operators.profile import category_drift

        ref = ["a"] * 5 + [None] * 5
        new = ["a"] * 9 + [None]
        got = {r["category"]: r for r in
               category_drift(self._df(spark, ref), self._df(spark, new),
                              "c", top_k=3).collect()}
        assert got["__null__"]["n_ref"] == 5
        assert got["__null__"]["n_new"] == 1
        assert got["__null__"]["psi_contrib"] > 0

    def test_closed_form_smoothing(self, spark):
        import math

        from mehc_curation_spark.operators.profile import category_drift

        # one category, top_k=1 -> axis = {a, __other__}; tr=tn=2
        got = {r["category"]: r for r in
               category_drift(self._df(spark, ["a", "a"]),
                              self._df(spark, ["a", "a"]),
                              "c", top_k=1).collect()}
        assert got["a"]["p_ref"] == round(3 / 4, 6)
        assert got["__other__"]["p_ref"] == round(1 / 4, 6)
        assert got["a"]["psi_contrib"] == 0.0
        # shifted: ref 2xa, new 2xb -> a: (3/4 vs 1/4), other: (1/4 vs 3/4)
        got2 = {r["category"]: r for r in
                category_drift(self._df(spark, ["a", "a"]),
                               self._df(spark, ["b", "b"]),
                               "c", top_k=1).collect()}
        want = round((3 / 4 - 1 / 4) * math.log(3.0), 6)
        assert got2["a"]["psi_contrib"] == want
        assert got2["__other__"]["psi_contrib"] == want

    def test_validation(self, spark):
        import pytest

        from mehc_curation_spark.operators.profile import category_drift

        d = self._df(spark, ["a"])
        with pytest.raises(ValueError):
            category_drift(d, d, "c", top_k=0)


class TestLabelShift:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, label string")

    def test_matrix_counts_and_share(self, spark):
        from mehc_curation_spark.operators.profile import label_shift

        old = self._df(spark, [(1, "keep"), (2, "keep"), (3, "drop"),
                               (4, None)])
        new = self._df(spark, [(1, "keep"), (2, "drop"), (3, "drop"),
                               (5, "keep")])
        got = {(r["label_old"], r["label_new"]): r for r in
               label_shift(old, new, "id", "label").collect()}
        assert got[("keep", "keep")]["n"] == 1
        assert got[("keep", "drop")]["n"] == 1
        assert got[("drop", "drop")]["n"] == 1
        # id 4 exists only in old (NULL label), id 5 only in new
        assert got[("__null__", "__absent__")]["n"] == 1
        assert got[("__absent__", "keep")]["n"] == 1
        assert sum(r["n"] for r in got.values()) == 5
        assert abs(sum(r["share"] for r in got.values()) - 1.0) < 1e-6

    def test_identical_labelings_are_diagonal(self, spark):
        from mehc_curation_spark.operators.profile import label_shift

        rows = [(i, "keep" if i % 3 else "drop") for i in range(30)]
        df = self._df(spark, rows)
        got = label_shift(df, df, "id", "label").collect()
        assert all(r["label_old"] == r["label_new"] for r in got)
        assert sum(r["n"] for r in got) == 30


class TestRuleAblation:
    def _df(self, spark):
        # rows: (id, a_fires, b_fires)
        rows = [(1, True, False), (2, True, True), (3, False, True),
                (4, False, False), (5, None, False)]
        return spark.createDataFrame(rows, "id long, a boolean, b boolean")

    def test_counts_and_unique(self, spark):
        from pyspark.sql import functions as F

        from mehc_curation_spark.operators.profile import rule_ablation

        got = {r["rule"]: r for r in
               rule_ablation(self._df(spark),
                             {"ra": F.col("a"), "rb": F.col("b")}).collect()}
        # NULL flag counts as not-firing
        assert got["ra"]["n_drop"] == 2 and got["ra"]["n_unique"] == 1
        assert got["rb"]["n_drop"] == 2 and got["rb"]["n_unique"] == 1
        assert got["ra"]["n_any"] == 3 and got["ra"]["n_rows"] == 5
        assert got["ra"]["drop_share"] == round(2 / 5, 6)
        assert got["ra"]["unique_share"] == round(1 / 5, 6)

    def test_redundant_rule_has_zero_unique(self, spark):
        from pyspark.sql import functions as F

        from mehc_curation_spark.operators.profile import rule_ablation

        # rb fires on a strict subset of ra's rows
        df = self._df(spark)
        got = {r["rule"]: r for r in
               rule_ablation(df, {"ra": F.col("a") | F.col("b"),
                                  "rb": F.col("a") & F.col("b")}).collect()}
        assert got["rb"]["n_unique"] == 0
        assert got["ra"]["n_drop"] == got["ra"]["n_any"]

    def test_validation(self, spark):
        import pytest

        from mehc_curation_spark.operators.profile import rule_ablation

        with pytest.raises(ValueError):
            rule_ablation(self._df(spark), {})


class TestCategoryDriftGuards:
    def _df(self, spark, vals):
        return spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                     "id long, c string")

    def test_empty_reference_raises(self, spark):
        import pytest

        from mehc_curation_spark.operators.profile import category_drift

        empty = self._df(spark, ["a"]).filter("id < 0")
        with pytest.raises(ValueError, match="reference side has no rows"):
            category_drift(empty, self._df(spark, ["a"]), "c")

    def test_sentinel_in_topk_raises(self, spark):
        import pytest

        from mehc_curation_spark.operators.profile import category_drift

        bad = self._df(spark, ["__other__", "__other__", "x"])
        with pytest.raises(ValueError, match="__other__"):
            category_drift(bad, bad, "c", top_k=2)

    def test_sentinel_outside_topk_merges_with_tail(self, spark):
        from mehc_curation_spark.operators.profile import category_drift

        ref = self._df(spark, ["a"] * 5 + ["b"] * 4 + ["__other__", "z"])
        got = {r["category"]: r for r in
               category_drift(ref, ref, "c", top_k=2).collect()}
        assert got["__other__"]["n_ref"] == 2  # literal + z, merged
        n_total = sum(r["n_ref"] for r in got.values())
        assert n_total == 11


class TestRuleAblationNames:
    def test_dotted_rule_name(self, spark):
        from pyspark.sql import functions as F

        from mehc_curation_spark.operators.profile import rule_ablation

        df = spark.createDataFrame([(1, "xx"), (2, "yyyy")],
                                   "id long, t string")
        got = {r["rule"]: r for r in
               rule_ablation(df, {"len.check": F.length("t") < 3,
                                  "has y": F.col("t").contains("y")})
               .collect()}
        assert got["len.check"]["n_drop"] == 1
        assert got["has y"]["n_drop"] == 1
        assert got["len.check"]["n_unique"] == 1


class TestThresholdSweep:
    def _df(self, spark):
        # scores 0..9, label = score >= 5 (perfectly separable at 5)
        rows = [(i, float(i), i >= 5, "g" if i % 2 else "h")
                for i in range(10)]
        return spark.createDataFrame(
            rows, "id long, score double, y boolean, grp string")

    def test_hand_computed_ungrouped(self, spark):
        from mehc_curation_spark.operators.profile import threshold_sweep

        res = {r["threshold"]: r for r in threshold_sweep(
            self._df(spark), "score", "y", lo=0.0, hi=10.0,
            n_bins=10).collect()}
        assert len(res) == 10  # every bin occupied
        # threshold 5.0 keeps exactly the positives
        r5 = res[5.0]
        assert (r5["kept"], r5["tp"], r5["n_rows"], r5["n_pos"]) == \
            (5, 5, 10, 5)
        assert r5["precision"] == 1.0 and r5["recall"] == 1.0 \
            and r5["f1"] == 1.0
        # threshold 0.0 keeps everything
        r0 = res[0.0]
        assert r0["kept"] == 10 and r0["precision"] == 0.5 \
            and r0["recall"] == 1.0
        # threshold 8.0 keeps 2 positives: precision 1, recall 0.4
        r8 = res[8.0]
        assert r8["kept"] == 2 and r8["precision"] == 1.0 \
            and r8["recall"] == 0.4

    def test_grouped_and_clamping(self, spark):
        from mehc_curation_spark.operators.profile import threshold_sweep

        d = self._df(spark)
        res = threshold_sweep(d, "score", "y", lo=2.0, hi=8.0,
                              n_bins=3, group_col="grp").collect()
        # per-group totals must be the group sizes (out-of-range
        # scores clamp into edge bins, they are never dropped)
        by_g = {}
        for r in res:
            by_g.setdefault(r["grp"], []).append(r)
        for g, rows in by_g.items():
            assert all(r["n_rows"] == 5 for r in rows)
            ks = sorted(r["threshold"] for r in rows)
            assert ks == [2.0, 4.0, 6.0]
            # kept is monotone nonincreasing in threshold
            kept = [r["kept"] for r in sorted(
                rows, key=lambda r: r["threshold"])]
            assert kept == sorted(kept, reverse=True)

    def test_null_exclusion_and_guards(self, spark):
        import pytest

        from mehc_curation_spark.operators.profile import threshold_sweep

        d = spark.createDataFrame(
            [(1, 1.0, True, "g"), (2, None, True, "g"),
             (3, 2.0, None, "g"), (4, 3.0, False, None)],
            "id long, score double, y boolean, grp string")
        rows = threshold_sweep(d, "score", "y", lo=0.0, hi=4.0,
                               n_bins=4, group_col="grp").collect()
        assert sum(r["n_rows"] for r in rows) / len(rows) == 1  # only id 1
        with pytest.raises(ValueError, match="n_bins"):
            threshold_sweep(d, "score", "y", lo=0.0, hi=1.0, n_bins=0)
        with pytest.raises(ValueError, match="hi > lo"):
            threshold_sweep(d, "score", "y", lo=1.0, hi=1.0)


class TestCalibrationReport:
    def test_hand_computed(self, spark):
        from mehc_curation_spark.operators.profile import (
            calibration_report,
        )

        # bin 0: probs .05/.05, one positive -> conf .05, acc .5
        # bin 9: probs .95/1.0 (1.0 clamps into bin 9), both positive
        rows = [(0.05, True), (0.05, False), (0.95, True), (1.0, True)]
        d = spark.createDataFrame(rows, "p double, y boolean")
        res = {r["bin"]: r for r in
               calibration_report(d, "p", "y", n_bins=10).collect()}
        assert set(res) == {0, 9}
        b0, b9 = res[0], res[9]
        assert (b0["n"], b0["n_pos"]) == (2, 1)
        assert b0["conf"] == 0.05 and b0["acc"] == 0.5
        assert b0["gap"] == 0.45
        assert (b9["n"], b9["n_pos"]) == (2, 2)
        assert b9["conf"] == 0.975 and b9["acc"] == 1.0
        assert b9["gap"] == 0.025

    def test_nulls_and_partition_invariance(self, spark):
        import pytest

        from mehc_curation_spark.operators.profile import (
            calibration_report,
        )

        rows = ([(i / 100.0, i % 3 == 0) for i in range(100)]
                + [(None, True), (0.5, None)])
        outs = []
        for parts in (1, 7):
            d = spark.createDataFrame(
                rows, "p double, y boolean").repartition(parts)
            res = calibration_report(d, "p", "y", n_bins=10).collect()
            assert sum(r["n"] for r in res) == 100  # NULLs excluded
            outs.append(sorted(
                (r["bin"], r["n"], r["n_pos"], r["conf"], r["acc"],
                 r["gap"]) for r in res))
        assert outs[0] == outs[1]
        with pytest.raises(ValueError, match="n_bins"):
            calibration_report(d, "p", "y", n_bins=0)


class TestAucReport:
    def test_matches_sklearn_free_reference(self, spark):
        """Hand/NumPy Mann-Whitney reference on random data with ties
        (no sklearn in the container — the midrank formula IS the
        published identity)."""
        import numpy as np

        from mehc_curation_spark.operators.profile import auc_report

        rng = np.random.default_rng(5)
        scores = rng.integers(0, 20, size=200).astype(float)  # ties!
        labels = rng.random(200) < (scores / 25.0)  # score-correlated
        rows = [(float(s), bool(y)) for s, y in zip(scores, labels)]
        got = auc_report(
            spark.createDataFrame(rows, "s double, y boolean"),
            "s", "y").collect()[0]

        order = np.argsort(scores, kind="stable")
        ranks = np.empty(200)
        sorted_s = scores[order]
        i = 0
        r = 1
        while i < 200:
            j = i
            while j < 200 and sorted_s[j] == sorted_s[i]:
                j += 1
            ranks[order[i:j]] = (r + (r + (j - i) - 1)) / 2.0
            r += j - i
            i = j
        npos = int(labels.sum())
        nneg = 200 - npos
        exp = (ranks[labels].sum() - npos * (npos + 1) / 2.0) \
            / (npos * nneg)
        assert got["n"] == 200 and got["n_pos"] == npos
        assert got["auc"] == round(exp, 6)

    def test_perfect_and_degenerate(self, spark):
        from mehc_curation_spark.operators.profile import auc_report

        # perfectly separating score -> AUC 1.0
        rows = [(float(i), i >= 5, "g") for i in range(10)]
        d = spark.createDataFrame(rows, "s double, y boolean, g string")
        assert auc_report(d, "s", "y").collect()[0]["auc"] == 1.0
        # anti-separating -> 0.0; all-one-class -> NULL
        rows2 = ([(float(i), i < 5, "a") for i in range(10)]
                 + [(1.0, True, "b"), (2.0, True, "b")])
        res = {r["g"]: r for r in auc_report(
            spark.createDataFrame(rows2, "s double, y boolean, g string"),
            "s", "y", group_col="g").collect()}
        assert res["a"]["auc"] == 0.0
        assert res["b"]["auc"] is None and res["b"]["n_neg"] == 0
