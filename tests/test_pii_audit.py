"""PII audit (operators/pii_audit.py)."""

from mehc_curation_spark.operators.pii_audit import pii_audit


def _audit(spark, text):
    df = spark.createDataFrame([("d1", text)], "id string, text string")
    return pii_audit(df, "id", "text").collect()[0]


def test_luhn_valid_card_counted(spark):
    r = _audit(spark, "pay with 4111 1111 1111 1111 today")
    assert r["n_card_like"] == 1 and r["n_card_valid"] == 1
    assert r["n_pii"] == 1 and r["has_pii"]


def test_luhn_invalid_card_not_valid(spark):
    r = _audit(spark, "ref 4111111111111112 is not a card")
    assert r["n_card_like"] == 1 and r["n_card_valid"] == 0
    assert r["n_pii"] == 0 and not r["has_pii"]


def test_residue_chain_no_double_count(spark):
    # the email's @domain tail must not also count as a handle, and
    # the card's digit groups must not also count as phones
    r = _audit(spark, "bob@site.com and @bob and 4111-1111-1111-1111")
    assert r["n_email"] == 1
    assert r["n_handle"] == 1  # only the standalone @bob
    assert r["n_card_like"] == 1 and r["n_phone"] == 0


def test_all_classes(spark):
    r = _audit(spark, "a@b.co www.x.y 4111 1111 1111 1111 "
                      "123-45-6789 415-555-2671 @zed")
    assert (r["n_email"], r["n_url"], r["n_card_valid"],
            r["n_ssn"], r["n_phone"], r["n_handle"]) == (1, 1, 1, 1, 1, 1)
    assert r["n_pii"] == 6


def test_null_text_all_zero(spark):
    r = _audit(spark, None)
    assert r["n_pii"] == 0 and r["has_pii"] is False
    assert r["n_card_like"] == 0


def test_pure_map_no_exchange(spark):
    df = spark.createDataFrame([("d1", "x")], "id string, text string")
    s = pii_audit(df, "id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in s, s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s, s
