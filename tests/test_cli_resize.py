"""CLI resize subcommand (subprocess — the CLI owns its SparkSession)."""

import json
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pairs_file(tmp_path_factory):
    from mehc_curation_spark.fixtures import write_pairs_parquet

    return write_pairs_parquet(
        str(tmp_path_factory.mktemp("clirz") / "pairs"), 400, seed=5)


def _run(args):
    proc = subprocess.run(
        [sys.executable, "-m", "mehc_curation_spark", *args],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc


def test_resize_cli_rehash(pairs_file, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clirz") / "rz_out")
    proc = _run(["resize", "-i", pairs_file, "-o", out,
                 "--target", "24", "--rehash", "--cores", "4"])
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 400
    assert 0 < summary["undecodable"] < 20
    assert summary["resized"] > 300  # fixtures are mostly > 24px

    got = duckdb.sql(
        f"select * from read_parquet('{out}/data/*.parquet')").df()
    assert len(got) == 400
    # pass-through columns survived the join
    assert {"image_id", "caption", "phash", "bytes", "w", "h",
            "fmt", "resized", "decode_ok"} <= set(got.columns)

    # spot-check: recomputed phash equals phash64 over the decoded
    # resized payload, and dims obey the longest-side cap
    from mehc_curation_spark.codecs.image import decode_image
    from mehc_curation_spark.codecs.phash import phash64

    ok = got[got["decode_ok"]].head(20)
    for r in ok.itertuples(index=False):
        assert max(int(r.w), int(r.h)) <= 24
        px = decode_image(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
        assert int(r.phash) == phash64(px)


def test_resize_cli_no_rehash_keeps_phash(pairs_file, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clirz") / "rz_plain")
    _run(["resize", "-i", pairs_file, "-o", out, "--target", "24",
          "--cores", "4"])
    got = duckdb.sql(
        f"select g.image_id, g.phash AS new_ph, o.phash AS old_ph "
        f"from read_parquet('{out}/data/*.parquet') g "
        f"join read_parquet('{pairs_file}') o using (image_id)").df()
    assert len(got) == 400
    assert (got["new_ph"] == got["old_ph"]).all()


def test_resize_cli_crop_first(tmp_path_factory):
    import numpy as np
    import pandas as pd

    from mehc_curation_spark.codecs.phash import phash64
    from mehc_curation_spark.codecs.resize import resize_bilinear

    rng = np.random.RandomState(31)
    inner = rng.randint(60, 200, (40, 80, 3), dtype=np.uint8)
    letter = np.zeros((60, 80, 3), np.uint8)
    letter[10:50] = inner  # 10px bars top+bottom
    small = rng.randint(0, 256, (10, 12, 3), dtype=np.uint8)
    d = tmp_path_factory.mktemp("clirz2")
    inp = str(d / "in.parquet")
    pd.DataFrame({
        "image_id": ["letter", "small", "corrupt"],
        "bytes": [letter.tobytes(), small.tobytes(), b"\x00"],
        "w": np.array([80, 12, 9], dtype="int32"),
        "h": np.array([60, 10, 9], dtype="int32"),
        "fmt": ["raw", "raw", "png"],
        "caption": ["a", "b", "c"],
        "phash": np.array([1, 2, 3], dtype="int64"),
    }).to_parquet(inp)

    out = str(d / "out")
    proc = _run(["resize", "-i", inp, "-o", out, "--target", "20",
                 "--crop", "--rehash", "--cores", "2"])
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 3 and summary["undecodable"] == 1

    got = {r["image_id"]: r for _, r in duckdb.sql(
        f"select * from read_parquet('{out}/data/*.parquet')")
        .df().iterrows()}
    r = got["letter"]
    # bars removed (40x80 survives), then longest side capped at 20
    assert (r["cropped"], r["crop_top"], r["crop_bottom"]) == (True, 10, 10)
    assert (int(r["w"]), int(r["h"])) == (20, 10)
    exp = resize_bilinear(inner, 10, 20)
    assert bytes(r["bytes"]) == exp.tobytes()
    assert int(r["phash"]) == phash64(exp)
    assert r["caption"] == "a"

    s = got["small"]
    assert (s["cropped"], bool(s["resized"])) == (False, False)
    assert bytes(s["bytes"]) == small.tobytes()
    assert int(s["phash"]) == phash64(small)  # rehash still applies

    c = got["corrupt"]
    assert not c["decode_ok"] and pd.isna(c["bytes"])
    assert int(c["phash"]) == 3  # undecodable keeps the stored hash
