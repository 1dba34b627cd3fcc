"""Tests for the round-3 training-export ops: shard writer
(io/export.py), aspect-ratio bucketing (operators/multimodal.py) and
distributed BPE training (operators/vocab.py)."""

import glob
import hashlib
import json
import math
import os

import pytest
from pyspark.sql import functions as F

from mehc_curation_spark.io.export import (
    MAX_SHARDS,
    assign_shards,
    export_shards,
)
from mehc_curation_spark.operators.multimodal import (
    ar_bucket_table,
    assign_ar_buckets,
)
from mehc_curation_spark.operators.vocab import bpe_train, bpe_train_local


def _u48_local(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:6], "little")


# ---------------------------------------------------------------------------
# shard export
# ---------------------------------------------------------------------------

class TestShardExport:
    def test_assignment_matches_closed_form(self, spark, pairs_df):
        got = {r["image_id"]: (r["shard"], r["pos"])
               for r in assign_shards(pairs_df, n_shards=8, seed=3)
               .select("image_id", "shard", "pos").collect()}
        ids = [r[0] for r in pairs_df.select("image_id").collect()]
        order = sorted(ids, key=lambda i: (_u48_local(f"3:{i}"), i))
        pos_ctr = {}
        for i in order:
            sh = (_u48_local(f"3:{i}") * 8) >> 48
            pos_ctr[sh] = pos_ctr.get(sh, 0) + 1
            assert got[i] == (sh, pos_ctr[sh]), i

    def test_partition_invariant(self, spark, pairs_df):
        a = (assign_shards(pairs_df, n_shards=5)
             .select("image_id", "shard", "pos").toPandas()
             .sort_values("image_id").reset_index(drop=True))
        b = (assign_shards(pairs_df.repartition(17), n_shards=5)
             .select("image_id", "shard", "pos").toPandas()
             .sort_values("image_id").reset_index(drop=True))
        assert a.equals(b)

    def test_seeds_give_different_orders(self, spark, pairs_df):
        a = assign_shards(pairs_df, n_shards=4, seed=0) \
            .select("image_id", "shard").toPandas()
        b = assign_shards(pairs_df, n_shards=4, seed=1) \
            .select("image_id", "shard").toPandas()
        m = a.merge(b, on="image_id")
        assert (m["shard_x"] != m["shard_y"]).mean() > 0.5

    def test_export_one_file_per_shard_and_manifest(self, spark, pairs_df,
                                                    tmp_path):
        path = str(tmp_path / "exp")
        m = export_shards(pairs_df, path, n_shards=6, seed=0)
        assert m["n_shards"] == 6 and m["rows"] == pairs_df.count()
        dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
        assert len(dirs) == 6
        for d in dirs:
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, d
        disk = json.load(open(os.path.join(path, "_manifest.json")))
        assert disk == m
        # hash balance: no shard more than 40% off the mean
        mean = m["rows"] / 6
        for s in m["shards"]:
            assert abs(s["rows"] - mean) < 0.4 * mean
        # shard files round-trip with the recorded rows, in (u48,id) order
        back = spark.read.parquet(path)
        assert back.count() == m["rows"]
        one = (back.filter(F.col("shard") == 0)
               .select("image_id", "pos").toPandas())
        exp = sorted(one["image_id"],
                     key=lambda i: (_u48_local(f"0:{i}"), i))
        assert list(one.sort_values("pos")["image_id"]) == exp

    def test_target_bytes_derives_shard_count(self, spark, pairs_df,
                                              tmp_path):
        total = pairs_df.select(
            F.sum(F.coalesce(F.length("bytes"), F.lit(0)))).first()[0]
        target = total // 4
        m = export_shards(pairs_df, str(tmp_path / "tb"),
                          target_bytes=target)
        assert m["n_shards"] == math.ceil(total / target)

    def test_param_validation(self, spark, pairs_df):
        with pytest.raises(ValueError):
            assign_shards(pairs_df)  # neither
        with pytest.raises(ValueError):
            assign_shards(pairs_df, n_shards=4, target_bytes=100)  # both
        with pytest.raises(ValueError):
            assign_shards(pairs_df, n_shards=0)
        with pytest.raises(ValueError):
            assign_shards(pairs_df, n_shards=MAX_SHARDS + 1)

    def test_single_exchange_plan(self, spark, pairs_df):
        plan = assign_shards(pairs_df, n_shards=8) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# aspect-ratio buckets
# ---------------------------------------------------------------------------

class TestArBuckets:
    def test_bucket_table_properties(self):
        t = ar_bucket_table(target_area=512 * 512, stride=64,
                            min_dim=256, max_ar=4.0)
        ars = [w / h for _, w, h, _ in t]
        assert ars == sorted(ars) and len(set(ars)) == len(ars)
        for i, w, h, la in t:
            assert w % 64 == 0 and h % 64 == 0
            assert w * h <= 512 * 512
            assert max(w, h) / min(w, h) <= 4.0
            assert la == pytest.approx(math.log(w / h))
        # symmetric: (w,h) present iff (h,w) present, square included
        shapes = {(w, h) for _, w, h, _ in t}
        assert {(h, w) for w, h in shapes} == shapes
        assert (512, 512) in shapes

    def test_assignment_is_nearest_log_ar(self, spark, pairs_df):
        t = ar_bucket_table()
        got = assign_ar_buckets(pairs_df) \
            .select("image_id", "w", "h", "bucket_id", "bucket_w",
                    "bucket_h", "scale").collect()
        for r in got:
            la = math.log(r["w"] / r["h"])
            best = min(t, key=lambda b: (abs(la - b[3]), b[0]))
            assert r["bucket_id"] == best[0], (r["w"], r["h"])
            assert (r["bucket_w"], r["bucket_h"]) == (best[1], best[2])
            # cover fit: scale fills both bucket dims
            assert r["scale"] * r["w"] >= r["bucket_w"] - 1e-9
            assert r["scale"] * r["h"] >= r["bucket_h"] - 1e-9
            assert r["scale"] == pytest.approx(
                max(best[1] / r["w"], best[2] / r["h"]))

    def test_no_shuffle_no_python(self, spark, pairs_df):
        plan = assign_ar_buckets(pairs_df) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "ArrowEval" not in plan

    def test_empty_table_raises(self, spark, pairs_df):
        with pytest.raises(ValueError):
            assign_ar_buckets(pairs_df, target_area=100, stride=64,
                              min_dim=256)


# ---------------------------------------------------------------------------
# BPE training
# ---------------------------------------------------------------------------

class TestBpeTrain:
    CORPUS = [
        "low low low low lower lower newest newest newest",
        "newest newest newest widest widest widest",
        "the newest the lowest the widest the low",
    ]

    def _df(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_matches_scalar_twin(self, spark):
        df = self._df(spark, self.CORPUS).repartition(7)
        got = bpe_train(df, n_merges=12, checkpoint_every=4)
        exp = bpe_train_local(self.CORPUS, n_merges=12)
        assert got == exp and len(got) == 12

    def test_early_stop_when_below_min_freq(self, spark):
        texts = ["ab cd", "ef gh"]  # every pair occurs once
        assert bpe_train(self._df(spark, texts), n_merges=5,
                         min_freq=2) == []
        assert bpe_train_local(texts, n_merges=5, min_freq=2) == []

    def test_greedy_merge_is_non_overlapping(self, spark):
        # 'aaaa' under (a,a) must become [aa, aa], giving (aa, aa) next
        texts = ["aaaa aaaa aaaa"]
        got = bpe_train(self._df(spark, texts), n_merges=2, min_freq=2)
        assert got == bpe_train_local(texts, n_merges=2, min_freq=2)
        assert got == [("a", "a"), ("aa", "aa")]

    def test_null_and_empty_text(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "hi hi hi")],
            "doc_id long, text string")
        got = bpe_train(df, n_merges=3, min_freq=2)
        assert got == bpe_train_local([None, "", "hi hi hi"], n_merges=3,
                                      min_freq=2) == [("h", "i")]


# ---------------------------------------------------------------------------
# split assignment
# ---------------------------------------------------------------------------

class TestSplitCol:
    def _assign(self, spark, weights, seed=0, n=4000):
        from mehc_curation_spark.operators.sampling import split_col
        df = spark.range(n).select(F.col("id").alias("doc_id"))
        return df.select("doc_id",
                         split_col(F.col("doc_id"), weights,
                                   seed=seed).alias("split"))

    def test_total_disjoint_and_proportional(self, spark):
        got = self._assign(spark, {"train": 0.9, "val": 0.05,
                                   "test": 0.05}).toPandas()
        frac = got["split"].value_counts(normalize=True)
        assert set(frac.index) == {"train", "val", "test"}
        assert abs(frac["train"] - 0.9) < 0.02
        assert abs(frac["val"] - 0.05) < 0.01
        assert abs(frac["test"] - 0.05) < 0.01

    def test_matches_closed_form_and_partition_invariant(self, spark):
        got = {r["doc_id"]: r["split"]
               for r in self._assign(spark, {"a": 0.5, "b": 0.5},
                                     seed=7).collect()}
        for i in range(0, 4000, 97):
            u = _u48_local(f"split:7:{i}")
            assert got[i] == ("a" if u < int(0.5 * 2**48) else "b")

    def test_uncorrelated_with_export_shuffle_key(self, spark, pairs_df):
        from mehc_curation_spark.operators.sampling import split_col
        s = assign_shards(pairs_df, n_shards=4, seed=0).withColumn(
            "split", split_col(F.col("image_id"),
                               {"train": 0.75, "test": 0.25}, seed=0))
        pdf = s.select("shard", "split").toPandas()
        # test rows must appear in EVERY shard, not pile into the last
        per = pdf[pdf["split"] == "test"].groupby("shard").size()
        assert len(per) == 4 and per.min() > 0

    def test_weight_validation(self, spark):
        import pytest as _pt
        from mehc_curation_spark.operators.sampling import split_col
        with _pt.raises(ValueError):
            split_col(F.lit("x"), {})
        with _pt.raises(ValueError):
            split_col(F.lit("x"), {"a": 0.9, "b": 0.2})


# ---------------------------------------------------------------------------
# WebDataset tar export
# ---------------------------------------------------------------------------

class TestWebdatasetExport:
    def test_roundtrip_and_determinism(self, spark, pairs_df, tmp_path):
        import tarfile

        from mehc_curation_spark.io.export import export_webdataset

        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        m1 = export_webdataset(pairs_df, p1, n_shards=3, seed=0)
        m2 = export_webdataset(pairs_df.repartition(13), p2,
                               n_shards=3, seed=0)
        # byte determinism across partitionings
        assert [s["tar_md5"] for s in m1["shards"]] == \
               [s["tar_md5"] for s in m2["shards"]]
        assert m1["rows"] == pairs_df.count()
        # extraction round-trip of one shard
        t = tarfile.open(os.path.join(p1, "shard-00000.tar"))
        names = t.getnames()
        assert len(names) == 2 * m1["shards"][0]["rows"]
        ids = [n[:-4] for n in names if n.endswith(".img")]
        raw = {r["image_id"]: r for r in pairs_df.filter(
            F.col("image_id").isin(ids[:20])).collect()}
        for rid in ids[:20]:
            got = t.extractfile(f"{rid}.img").read()
            exp = raw[rid]["bytes"]
            assert got == (bytes(exp) if exp is not None else b"")
            meta = json.loads(t.extractfile(f"{rid}.json").read())
            assert meta["caption"] == raw[rid]["caption"]
            assert meta["phash"] == raw[rid]["phash"]

    def test_manifest_totals(self, spark, pairs_df, tmp_path):
        from mehc_curation_spark.io.export import export_webdataset

        p = str(tmp_path / "w")
        m = export_webdataset(pairs_df, p, n_shards=4, seed=1)
        disk = json.load(open(os.path.join(p, "_manifest.json")))
        assert disk == m
        assert sum(s["rows"] for s in m["shards"]) == m["rows"]
        for s in m["shards"]:
            assert os.path.getsize(
                os.path.join(p, f"shard-{s['shard']:05d}.tar")) \
                == s["tar_bytes"]


# ---------------------------------------------------------------------------
# export durability: verify + resume
# ---------------------------------------------------------------------------

class TestExportDurability:
    def test_verify_then_corrupt_then_resume(self, spark, pairs_df,
                                             tmp_path):
        from mehc_curation_spark.io.export import (
            export_webdataset,
            verify_export,
        )

        p = str(tmp_path / "w")
        m = export_webdataset(pairs_df, p, n_shards=4, seed=0)
        assert verify_export(spark, p)["ok"]

        # truncate one shard, delete another
        t1 = os.path.join(p, "shard-00001.tar")
        with open(t1, "r+b") as f:
            f.truncate(100)
        os.remove(os.path.join(p, "shard-00002.tar"))
        v = verify_export(spark, p)
        assert not v["ok"]
        assert v["missing"] == [2] and v["mismatched"] == [1]

        # resume rewrites exactly the two broken shards
        before = {k: os.path.getmtime(os.path.join(p, f"shard-0000{k}.tar"))
                  for k in (0, 3)}
        m2 = export_webdataset(pairs_df, p, n_shards=4, seed=0, resume=True)
        assert m2["resumed_shards"] == [0, 3]
        assert [s["tar_md5"] for s in m2["shards"]] == \
               [s["tar_md5"] for s in m["shards"]]
        assert verify_export(spark, p)["ok"]
        for k, t in before.items():
            assert os.path.getmtime(
                os.path.join(p, f"shard-0000{k}.tar")) == t  # untouched

    def test_resume_refuses_parameter_drift(self, spark, pairs_df,
                                            tmp_path):
        from mehc_curation_spark.io.export import export_webdataset

        p = str(tmp_path / "w2")
        export_webdataset(pairs_df, p, n_shards=3, seed=0)
        with pytest.raises(ValueError):
            export_webdataset(pairs_df, p, n_shards=3, seed=1, resume=True)

    def test_verify_parquet_layout(self, spark, pairs_df, tmp_path):
        from mehc_curation_spark.io.export import (
            export_shards,
            verify_export,
        )

        p = str(tmp_path / "pq")
        export_shards(pairs_df, p, n_shards=5, seed=0)
        assert verify_export(spark, p)["ok"]


# ---------------------------------------------------------------------------
# card drift
# ---------------------------------------------------------------------------

class TestCardDrift:
    BASE = {
        "rows": 1000, "exact_dup_rate": 0.03,
        "tokens_per_doc": {"p50": 40},
        "quality": {"keep_rate": 0.80},
        "languages": [{"lang": "en", "share": 0.7},
                      {"lang": "de", "share": 0.3}],
    }

    def test_no_drift_is_ok(self):
        from mehc_curation_spark.io.card import card_drift
        d = card_drift(self.BASE, dict(self.BASE))
        assert d["ok"] and d["flags"] == []
        assert d["deltas"]["lang_tv"] == 0.0

    def test_each_flag_fires(self):
        import copy

        from mehc_curation_spark.io.card import card_drift
        cases = {
            "dup_rate_jump": ("exact_dup_rate", 0.08),
            "keep_rate_drop": (("quality", "keep_rate"), 0.70),
            "tok_p50_rel": (("tokens_per_doc", "p50"), 60),
        }
        for flag, (path, val) in cases.items():
            new = copy.deepcopy(self.BASE)
            if isinstance(path, tuple):
                new[path[0]][path[1]] = val
            else:
                new[path] = val
            d = card_drift(self.BASE, new)
            assert d["flags"] == [flag], (flag, d)
        new = copy.deepcopy(self.BASE)
        new["languages"] = [{"lang": "en", "share": 0.5},
                            {"lang": "fr", "share": 0.5}]
        d = card_drift(self.BASE, new)
        assert "lang_tv" in d["flags"] and d["deltas"]["lang_tv"] == 0.5

    def test_threshold_override(self):
        import copy

        from mehc_curation_spark.io.card import card_drift
        new = copy.deepcopy(self.BASE)
        new["exact_dup_rate"] = 0.08
        assert card_drift(self.BASE, new,
                          {"dup_rate_jump": 0.10})["ok"]


class TestBpeEncode:
    def test_matches_scalar_and_rejoins(self, spark):
        from mehc_curation_spark.operators.vocab import (
            bpe_encode_local,
            bpe_encode_udf,
            bpe_train,
        )
        texts = TestBpeTrain.CORPUS + [None, "", "  ", "héllo wörld"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string").repartition(5)
        m = bpe_train(df, n_merges=8)
        enc = bpe_encode_udf(m)
        got = {r["doc_id"]: r["toks"] for r in
               df.select("doc_id", enc(F.col("text")).alias("toks"))
               .collect()}
        exp = bpe_encode_local(texts, m)
        for i, e in enumerate(exp):
            assert got[i] == e, (i, got[i], e)
        # merged tokens actually appear (the merges did something)
        assert any(len(t) > 1 for toks in got.values() for t in toks)

    def test_empty_merge_list_is_char_segmentation(self, spark):
        from mehc_curation_spark.operators.vocab import bpe_encode_udf
        df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
        got = df.select(bpe_encode_udf([])(F.col("text"))).first()[0]
        assert got == ["a", "b", "c", "d"]


class TestReviewRegressions:
    """Regressions from the round-3 self-review of the export /
    ingest / bucketing surfaces."""

    def _tiny(self, spark):
        return spark.createDataFrame(
            [(f"t{i}", bytearray(b"x" * 10), 1, 1, "raw", "c", i)
             for i in range(3)],
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long")

    def test_manifest_records_requested_layout_with_empty_shards(
            self, spark, tmp_path):
        from mehc_curation_spark.io.export import (
            export_webdataset,
            verify_export,
        )
        p = str(tmp_path / "w")
        m = export_webdataset(self._tiny(spark), p, n_shards=8, seed=0)
        assert m["n_shards"] == 8              # REQUESTED layout param
        assert len(m["shards"]) < 8            # some shards are empty
        assert verify_export(spark, p)["ok"]
        # resume re-derives the SAME layout: everything already done
        m2 = export_webdataset(self._tiny(spark), p, n_shards=None,
                               seed=0, resume=True)
        assert m2["n_shards"] == 8
        assert [s["tar_md5"] for s in m2["shards"]] == \
               [s["tar_md5"] for s in m["shards"]]

    def test_resume_without_manifest(self, spark, tmp_path):
        from mehc_curation_spark.io.export import export_webdataset
        p = str(tmp_path / "v")
        # died-before-manifest case WITH params: clean full run
        m = export_webdataset(self._tiny(spark), p, n_shards=2, seed=0,
                              resume=True)
        assert m["n_shards"] == 2 and m["resumed_shards"] == []
        # without params and without a manifest: clear error
        import shutil
        shutil.rmtree(p)
        with pytest.raises(ValueError, match="n_shards"):
            export_webdataset(self._tiny(spark), str(tmp_path / "x"),
                              resume=True)

    def test_fresh_export_removes_stale_tars(self, spark, pairs_df,
                                             tmp_path):
        from mehc_curation_spark.io.export import (
            export_webdataset,
            verify_export,
        )
        p = str(tmp_path / "w")
        export_webdataset(pairs_df, p, n_shards=6, seed=0)
        export_webdataset(pairs_df, p, n_shards=3, seed=0)
        tars = sorted(f for f in os.listdir(p) if f.endswith(".tar"))
        assert tars == [f"shard-{k:05d}.tar" for k in range(3)]
        assert verify_export(spark, p)["ok"]

    def test_resume_refuses_bytes_col_drift(self, spark, pairs_df,
                                            tmp_path):
        from mehc_curation_spark.io.export import export_webdataset
        p = str(tmp_path / "w")
        export_webdataset(pairs_df, p, n_shards=2, seed=0)
        with pytest.raises(ValueError, match="refusing"):
            export_webdataset(pairs_df.withColumn("thumb", F.col("bytes")),
                              p, bytes_col="thumb", n_shards=2, seed=0,
                              resume=True)

    def test_verify_reports_all_missing_instead_of_crashing(
            self, spark, pairs_df, tmp_path):
        from mehc_curation_spark.io.export import (
            export_webdataset,
            verify_export,
        )
        p = str(tmp_path / "w")
        m = export_webdataset(pairs_df, p, n_shards=3, seed=0)
        for f in os.listdir(p):
            if f.endswith(".tar"):
                os.remove(os.path.join(p, f))
        v = verify_export(spark, p)
        assert not v["ok"]
        assert v["missing"] == [s["shard"] for s in m["shards"]]

    def test_csv_writer_refuses_newline_in_any_string_col(self, tmp_path):
        import pandas as pd

        from mehc_curation_spark.io.ingest import write_pairs_csv
        pdf = pd.DataFrame({
            "image_id": ["bad\nid"], "bytes": [b"x"], "w": [1], "h": [1],
            "fmt": ["raw"], "caption": ["fine"], "phash": [1]})
        with pytest.raises(ValueError, match="image_id"):
            write_pairs_csv(pdf, str(tmp_path / "a.csv"))

    def test_ar_buckets_null_and_degenerate_dims(self, spark):
        from mehc_curation_spark.operators.multimodal import (
            assign_ar_buckets,
        )
        df = spark.createDataFrame(
            [("a", None, 10), ("b", 10, 0), ("c", 512, 512)],
            "image_id string, w int, h int")
        rows = {r["image_id"]: r for r in assign_ar_buckets(df).collect()}
        for k in ("a", "b"):
            assert rows[k]["bucket_id"] is None
            assert rows[k]["bucket_w"] is None
            assert rows[k]["bucket_h"] is None
            assert rows[k]["scale"] is None
        assert rows["c"]["bucket_id"] is not None


class TestReviewRegressions2:
    """Second self-review batch: NULL handling in sampling/card,
    packer preconditions, election scalability semantics."""

    def test_card_dup_rate_ignores_null_text(self, spark):
        from mehc_curation_spark.io.card import dataset_card
        df = spark.createDataFrame(
            [(i, None if i < 3 else f"distinct text {i}", "en")
             for i in range(10)],
            "doc_id long, text string, lang string")
        c = dataset_card(df, exact_distinct=True)
        assert c["null_text"] == 3
        assert c["exact_dup_rate"] == 0.0  # no real duplicates

    def test_token_budget_null_stratum_gets_default(self, spark):
        from mehc_curation_spark.operators.sampling import (
            token_budget_sample,
        )
        df = spark.createDataFrame(
            [(1, "en", "a b c"), (2, None, "d e f"), (3, None, "g h")],
            "doc_id long, lang string, text string")
        got = token_budget_sample(df, "doc_id", "lang", "text",
                                  {"en": 100}, default_budget=100)
        ids = {r["doc_id"] for r in got.collect()}
        assert ids == {1, 2, 3}  # NULL-lang rows kept under the default
        none_kept = token_budget_sample(df, "doc_id", "lang", "text",
                                        {"en": 100}, default_budget=0)
        assert {r["doc_id"] for r in none_kept.collect()} == {1}

    def test_token_budget_rejects_colliding_columns(self, spark):
        from mehc_curation_spark.operators.sampling import (
            token_budget_sample,
        )
        df = spark.createDataFrame(
            [(1, "en", "a", 5)], "doc_id long, lang string, "
            "text string, n_tok long")
        with pytest.raises(ValueError, match="n_tok"):
            token_budget_sample(df, "doc_id", "lang", "text", {"en": 1})

    def test_quality_tiers_approx_null_stratum_own_boundaries(self, spark):
        from mehc_curation_spark.operators.sampling import (
            quality_tiers_approx,
        )
        rows = [(i, "en", 0.5) for i in range(9)]
        rows += [(100 + i, None, float(i)) for i in range(9)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, lang string, score double")
        got = {r["doc_id"]: r["tier"]
               for r in quality_tiers_approx(df, "doc_id", "lang",
                                             "score").collect()}
        # best null-stratum scorer must be head, worst tail
        assert got[108] == "head" and got[100] == "tail"

    def test_split_col_null_id_is_null(self, spark):
        from mehc_curation_spark.operators.sampling import split_col
        df = spark.createDataFrame([("a",), (None,)], "id string")
        got = {r["id"]: r["split"] for r in df.select(
            "id", split_col(F.col("id"),
                            {"train": 0.5, "test": 0.5}).alias("split")
        ).collect()}
        assert got[None] is None and got["a"] in ("train", "test")

    def test_pack_chunks_null_ntok_clear_error(self, spark):
        from mehc_curation_spark.operators.chunking import pack_chunks
        df = spark.createDataFrame(
            [("a", 5), ("b", None)], "uid string, n_tok long")
        with pytest.raises(Exception, match="NULL 'n_tok'"):
            pack_chunks(df, "uid", "n_tok", seq_tokens=16).collect()

    def test_rep_election_no_cluster_window(self, spark):
        """Election must plan as aggregates — no Window node keyed on
        cluster (components can merge buckets into one huge cluster)."""
        from mehc_curation_spark.operators.graph import near_dup_clusters
        df = spark.createDataFrame(
            [(f"n{i}", i % 3) for i in range(12)],
            "id string, quality int")
        pairs = spark.createDataFrame(
            [(f"n{i}", f"n{i+1}") for i in range(11)],
            "id_a string, id_b string")
        out = near_dup_clusters(df, pairs, "id", quality_col="quality")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        rows = out.collect()
        reps = [r for r in rows if r["is_rep"]]
        assert len(reps) == 1  # one chain -> one cluster, one rep
        # highest quality (2), smallest id among the quality-2 nodes
        assert reps[0]["id"] == "n11" or reps[0]["quality"] == 2


class TestReviewRegressions4:
    """Fourth batch: whitespace tokenizer bias, empty-text scoring,
    ledger retraction, writable raw decode."""

    def test_token_count_boundary_whitespace(self, spark):
        from mehc_curation_spark.operators.text_stats import (
            token_count_col,
        )
        df = spark.createDataFrame(
            [(1, "a b\n"), (2, "\t"), (3, None), (4, ""), (5, " a\tb\nc ")],
            "i long, t string")
        got = {r["i"]: r["n"] for r in
               df.select("i", token_count_col(F.col("t")).alias("n"))
               .collect()}
        assert got == {1: 2, 2: 0, 3: None, 4: 0, 5: 3}

    def test_quality_score_empty_vs_null(self, spark):
        from mehc_curation_spark.operators.quality_model import (
            score_quality,
        )
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "some perfectly ordinary text " * 8)],
            "i long, t string")
        got = {r["i"]: (r["q_score"], r["q_keep"]) for r in
               score_quality(df, "t").collect()}
        assert got[2] == (None, None)          # NULL text: unscorable
        assert got[1][0] is not None           # empty text: scorable
        assert got[1][1] is False              # ... and a real False
        # identical content with/without a trailing newline: same score
        df2 = spark.createDataFrame(
            [(1, "hello world example"), (2, "hello world example\n")],
            "i long, t string")
        s2 = {r["i"]: r["q_score"] for r in score_quality(df2, "t").collect()}
        # ln1p_chars differs by the newline char itself; token features
        # must NOT differ (the phantom-token bias)
        from mehc_curation_spark.operators.quality_model import (
            quality_feature_cols,
        )
        f2 = df2.select("i", *[v.alias(k) for k, v in
                               quality_feature_cols(F.col("t")).items()]) \
            .collect()
        by = {r["i"]: r for r in f2}
        assert by[1]["ln1p_tokens"] == by[2]["ln1p_tokens"]
        assert by[1]["mean_tok_len"] == by[2]["mean_tok_len"]

    def test_ledger_retracts_before_replacing_bucket(self, tmp_path):
        import os

        from mehc_curation_spark.io.ledger import Ledger
        led = Ledger(str(tmp_path))
        staging = str(tmp_path / "stage1")
        os.makedirs(os.path.join(staging, "bucket=3"))
        open(os.path.join(staging, "bucket=3", "part.parquet"), "w") \
            .write("x")
        led.commit_buckets(staging, {3: {"rows": 1, "dropped": {}}}, 1.0)
        assert "3" in led.read()["buckets"]
        # retraction is durable and versioned
        v0 = led.read()["version"]
        led_fd = led._acquire_lock()
        try:
            led.retract_buckets([3])
        finally:
            os.close(led_fd)
        state = led.read()
        assert "3" not in state["buckets"] and state["version"] == v0 + 1
        # full replacement commit round-trips
        staging2 = str(tmp_path / "stage2")
        os.makedirs(os.path.join(staging2, "bucket=3"))
        open(os.path.join(staging2, "bucket=3", "part.parquet"), "w") \
            .write("y")
        led.commit_buckets(staging2, {3: {"rows": 2, "dropped": {}}}, 1.0)
        assert led.read()["buckets"]["3"]["rows"] == 2
        data = open(os.path.join(str(tmp_path), "data", "bucket=3",
                                 "part.parquet")).read()
        assert data == "y"

    def test_raw_decode_is_writable(self):
        import numpy as np

        from mehc_curation_spark.codecs.image import (
            decode_image,
            encode_image,
        )
        px = np.zeros((4, 4, 3), dtype=np.uint8)
        out = decode_image(encode_image(px, "raw"), "raw", 4, 4)
        out[0, 0, 0] = 7  # must not raise read-only
        assert out[0, 0, 0] == 7


# ---------------------------------------------------------------------------
# WebDataset reader
# ---------------------------------------------------------------------------

class TestWdsReader:
    def test_lossless_roundtrip(self, spark, pairs_df, tmp_path):
        from mehc_curation_spark.io.export import (
            export_webdataset,
            read_webdataset,
        )

        p = str(tmp_path / "w")
        man = export_webdataset(pairs_df, p, n_shards=3, seed=0)
        rt = read_webdataset(spark, p)
        assert rt.count() == man["rows"] == pairs_df.count()
        j = rt.join(pairs_df.withColumnRenamed("bytes", "ob"), "image_id")
        bad = j.filter(
            (F.col("bytes") != F.coalesce(F.col("ob"), F.lit(b"")))
            | ~F.get_json_object("meta", "$.caption")
               .eqNullSafe(F.col("caption"))
            | (F.get_json_object("meta", "$.phash").cast("long")
               != F.col("phash"))).count()
        assert bad == 0

    def test_positions_follow_shard_plan(self, spark, pairs_df, tmp_path):
        from mehc_curation_spark.io.export import (
            assign_shards,
            export_webdataset,
            read_webdataset,
        )

        p = str(tmp_path / "w")
        export_webdataset(pairs_df, p, n_shards=4, seed=2)
        got = {r["image_id"]: (r["shard"], r["pos"])
               for r in read_webdataset(spark, p).collect()}
        exp = {r["image_id"]: (r["shard"], r["pos"])
               for r in assign_shards(pairs_df, "image_id",
                                      n_shards=4, seed=2).collect()}
        assert got == exp

    def test_meta_fields_roundtrip(self, spark, pairs_df, tmp_path):
        from mehc_curation_spark.io.export import (
            export_webdataset,
            read_webdataset,
        )

        p = str(tmp_path / "w")
        export_webdataset(pairs_df, p, n_shards=2, seed=0)
        rt = read_webdataset(spark, p)
        parsed = rt.select(
            "image_id",
            F.get_json_object("meta", "$.w").cast("int").alias("w"),
            F.get_json_object("meta", "$.fmt").alias("fmt"))
        j = parsed.join(
            pairs_df.select("image_id",
                            F.col("w").alias("ew"),
                            F.col("fmt").alias("efmt")), "image_id")
        assert j.filter((F.col("w") != F.col("ew"))
                        | ~F.col("fmt").eqNullSafe(F.col("efmt"))
                        ).count() == 0
