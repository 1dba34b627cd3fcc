"""Command-line interface — graft of the reference's four argparse
CLIs (``/root/reference/mehc_curation/{validation,cleaning,
normalization,refinement}/__main__.py``), collapsed into subcommands:

    python -m mehc_curation_spark curate   -i <parquet> -o <table> [toggles]
    python -m mehc_curation_spark validate -i <parquet> -o <dir>
    python -m mehc_curation_spark clean    -i <parquet> -o <dir> [--toxicity_method ...]
    python -m mehc_curation_spark normalize -i <parquet> -o <dir>
    python -m mehc_curation_spark dedup    -i <parquet> -o <dir>

Flag names mirror the reference where the concept carries over
(--get_report, --n_cpu → --cores, method switch). All toggles default
True and the flag *disables* the step, exactly like the reference's
``action="store_false"`` flags (refinement/__main__.py:35-60).

Cluster use: ``spark-submit --py-files mehc_curation_spark.zip
-m ...`` — build the zip with ``python -m mehc_curation_spark package``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def _add_io(p: argparse.ArgumentParser) -> None:
    p.add_argument("-i", "--input", required=True,
                   help="Input parquet path (pairs schema)")
    p.add_argument("-o", "--output", required=True,
                   help="Output table/directory")
    p.add_argument("--cores", type=int, default=-1,
                   help="Local cores, -1 = all (≅ the reference's n_cpu)")
    p.add_argument("--master", default=None,
                   help="Spark master URL (omit under spark-submit)")
    p.add_argument("--get_report", action="store_true",
                   help="Render the text curation report")
    p.add_argument("--get_output", action="store_true",
                   help="Also export the rejected rows, partitioned by "
                        "drop reason, under <output>/rejected/ (≅ the "
                        "reference's per-step invalid-rows CSVs, "
                        "validation/core/output_manager.py:16-59; "
                        "normalization emits no rejects by design)")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mehc_curation_spark",
        description="PySpark-native image+caption curation engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("curate", help="full pipeline with dedup gates + resume")
    c.add_argument("--input_format",
                   choices=["parquet", "csv", "jsonl", "wds"],
                   default="parquet",
                   help="input table format; csv/jsonl carry the "
                        "base64 bytes_b64 interchange column; wds "
                        "reads a WebDataset shard-*.tar directory "
                        "(batch mode only)")
    _add_io(c)
    for flag, help_ in [
        ("validate", "image decode gate"),
        ("rm_low_quality", "heuristic caption rules"),
        ("rm_unknown_lang", "language-ID gate"),
        ("rm_high_ppl", "perplexity gate"),
        ("scrub_pii", "PII scrub"),
        ("scrub_toxicity", "toxicity scrub"),
        ("validate_post_scrub", "re-validate after scrubs"),
        ("normalize_lossy", "lossy text normalization"),
        ("normalize_canonical", "canonical rewrite"),
        ("rm_dup_between_stages", "dedup between stages"),
    ]:
        c.add_argument(f"--no_{flag}", dest=flag, action="store_false",
                       default=True, help=f"disable: {help_}")
    c.add_argument("--rm_low_quality_image", action="store_true",
                   default=False,
                   help="enable the opt-in image-quality gate (blur/"
                        "entropy/flatness/dims over the decoded pixels; "
                        "requires the decode gate)")
    c.add_argument("--toxicity_method", choices=["mask", "drop_sentence"],
                   default="mask",
                   help="≅ the reference's neutralizing_method boyle|rdkit")
    c.add_argument("--phash_buckets", type=int, default=64)
    c.add_argument("--dedup_strategy", choices=["auto", "window", "agg"],
                   default="auto",
                   help="'agg' = skew-robust partial-aggregate+join "
                        "dedup (use when single phashes are huge); "
                        "'auto' (default) samples the phash histogram "
                        "and picks 'agg' when one key exceeds 5%% share")
    c.add_argument("--no_resume", dest="resume", action="store_false",
                   default=True)
    c.add_argument("--incremental", action="store_true",
                   help="treat -i as an INCREMENT (rows not seen "
                        "before) and merge it into an existing output "
                        "table, replaying dedup only for the phash "
                        "groups the new rows touch (retracting "
                        "previously-kept rows their arrival conflicts "
                        "with); the first call bootstraps the table")
    c.add_argument("--flip_mode", choices=("mor", "cow"), default="mor",
                   help="with --incremental: how retraction flips "
                        "commit — 'mor' (default) appends the new "
                        "label versions + one equality-delete entry "
                        "(O(increment), no bucket rewrite); 'cow' "
                        "rewrites every bucket holding a flip (the "
                        "pre-r5 physical shape)")
    c.add_argument("--settle_deletes_after", type=int, default=16,
                   help="with --incremental --flip_mode mor: settle "
                        "pending flip debt (bucket-aware rewrite) "
                        "once this many delete entries accumulate; "
                        "0 = never settle inline")

    for name in ("validate", "clean", "normalize", "dedup"):
        s = sub.add_parser(name)
        _add_io(s)
        if name == "clean":
            s.add_argument("--toxicity_method",
                           choices=["mask", "drop_sentence"], default="mask")

    cd = sub.add_parser(
        "crossdedup",
        help="decontaminate candidates against a reference corpus "
             "(eval-set leak / already-curated filter); graft-only "
             "capability, no reference-CLI analog")
    cd.add_argument("-i", "--input", required=True,
                    help="candidate corpus parquet (the incoming data)")
    cd.add_argument("-r", "--reference", required=True,
                    help="reference corpus parquet (eval set / corpus "
                         "already trained on)")
    cd.add_argument("-o", "--output", required=True)
    cd.add_argument("--mode", choices=["text", "embedding", "exact",
                                       "image"],
                    default="text",
                    help="text = shingle-Jaccard MinHash bands; "
                         "embedding = cosine hyperplane-LSH kNN join; "
                         "exact = Bloom-prefiltered exact text match "
                         "(candidate side stays a narrow map stage); "
                         "image = per-tile phash exact-match join over "
                         "pairs-shaped payloads (overlay/re-encode "
                         "variants of already-curated images)")
    cd.add_argument("--threshold", type=float, default=None,
                    help="similarity threshold (default 0.5 text "
                         "Jaccard / 0.85 embedding cosine); for "
                         "--mode image it is the matching-TILE COUNT, "
                         "an integer in 1..16 (default 6)")
    cd.add_argument("--id_col", default=None,
                    help="id column (default doc_id; image_id for "
                         "--mode image)")
    cd.add_argument("--text_col", default="text")
    cd.add_argument("--vec_col", default="embedding")
    cd.add_argument("--reference_is_index", action="store_true",
                    help="image/text modes: -r points at a signature "
                         "snapshot table built by `tileindex` / "
                         "`textindex` instead of payload parquet — "
                         "the reference corpus is never re-decoded / "
                         "re-shingled; the index's build config is "
                         "adopted for candidate hashing")
    cd.add_argument("--drop", action="store_true",
                    help="also write the decontaminated candidates "
                         "(flagged rows removed) under <output>/data/")
    cd.add_argument("--cores", type=int, default=-1)
    cd.add_argument("--master", default=None)

    ti = sub.add_parser(
        "tileindex",
        help="materialize a reference corpus's tile-phash signatures "
             "as a snapshot table for repeated image decontamination "
             "(crossdedup --mode image --reference_is_index); "
             "graft-only capability")
    ti.add_argument("-i", "--input", required=True,
                    help="reference corpus parquet (pairs-shaped "
                         "payloads)")
    ti.add_argument("-o", "--output", required=True,
                    help="index table directory (snapshot table)")
    ti.add_argument("--append", action="store_true",
                    help="add this batch to the standing index "
                         "instead of rebuilding it")
    ti.add_argument("--grid", type=int, default=4,
                    help="tile grid (grid^2 tiles per image; must "
                         "match across appends)")
    ti.add_argument("--id_col", default="image_id")
    ti.add_argument("--cores", type=int, default=-1)
    ti.add_argument("--master", default=None)

    tx = sub.add_parser(
        "textindex",
        help="materialize a reference corpus's MinHash signature "
             "material (shingles + band keys) as a snapshot table for "
             "repeated text decontamination (crossdedup --mode text "
             "--reference_is_index); graft-only capability")
    tx.add_argument("-i", "--input", required=True,
                    help="reference corpus parquet (documents-shaped)")
    tx.add_argument("-o", "--output", required=True,
                    help="index table directory (snapshot table)")
    tx.add_argument("--append", action="store_true",
                    help="add this batch to the standing index "
                         "instead of rebuilding it")
    tx.add_argument("--id_col", default="doc_id")
    tx.add_argument("--text_col", default="text")
    tx.add_argument("--num_hashes", type=int, default=32)
    tx.add_argument("--bands", type=int, default=8)
    tx.add_argument("--shingle_k", type=int, default=3)
    tx.add_argument("--cores", type=int, default=-1)
    tx.add_argument("--master", default=None)

    cl = sub.add_parser(
        "clusters",
        help="resolve near-dup PAIRS into CLUSTERS (connected "
             "components, large-star/small-star) and elect one "
             "representative per cluster; graft-only capability")
    cl.add_argument("-i", "--input", required=True,
                    help="corpus parquet (documents / pairs / "
                         "embeddings shaped)")
    cl.add_argument("-o", "--output", required=True)
    cl.add_argument("--mode", choices=["text", "phash", "embedding",
                                       "tiles"],
                    default="text",
                    help="pair generator: text = MinHash-LSH Jaccard; "
                         "phash = banded hamming over the perceptual "
                         "hash; embedding = hyperplane-LSH cosine")
    cl.add_argument("--threshold", type=float, default=None,
                    help="similarity threshold (default 0.5 text "
                         "Jaccard / 0.9 embedding cosine); for "
                         "--mode tiles it is the matching-TILE COUNT, "
                         "an integer in 1..16 (default 6)")
    cl.add_argument("--max_hamming", type=int, default=4,
                    help="phash mode: max bit distance")
    cl.add_argument("--id_col", default=None,
                    help="default doc_id (text/embedding modes; "
                         "embedding falls back to vec_id) / image_id "
                         "(phash mode)")
    cl.add_argument("--text_col", default="text")
    cl.add_argument("--vec_col", default="embedding")
    cl.add_argument("--quality_col", default=None,
                    help="representative election key (highest wins; "
                         "default: smallest id)")
    cl.add_argument("--keep_reps", action="store_true",
                    help="also write the deduplicated corpus (cluster "
                         "representatives only) under <output>/data/")
    cl.add_argument("--cores", type=int, default=-1)
    cl.add_argument("--master", default=None)

    cc = sub.add_parser(
        "card",
        help="dataset card: one-pass corpus summary (rows/tokens/"
             "language mix/dup rate/quality keep rate); graft-only "
             "capability")
    cc.add_argument("-i", "--input", required=True,
                    help="corpus parquet with a text column")
    cc.add_argument("-o", "--output", required=True)
    cc.add_argument("--id_col", default="doc_id")
    cc.add_argument("--text_col", default="text")
    cc.add_argument("--lang_col", default="lang",
                    help="'' to skip the language rollup")
    cc.add_argument("--exact", action="store_true",
                    help="exact fingerprint cardinality instead of "
                         "HyperLogLog (small corpora / reconciliation)")
    cc.add_argument("--cores", type=int, default=-1)
    cc.add_argument("--master", default=None)

    ck = sub.add_parser(
        "chunk",
        help="split documents into overlapping fixed-token windows and "
             "optionally pack them into fixed-capacity training "
             "sequences (T5-style packing); graft-only capability")
    ck.add_argument("-i", "--input", required=True,
                    help="corpus parquet with a text column")
    ck.add_argument("-o", "--output", required=True)
    ck.add_argument("--chunk_tokens", type=int, default=512)
    ck.add_argument("--overlap", type=int, default=64)
    ck.add_argument("--pack", action="store_true",
                    help="also pack chunks into sequences; output is "
                         "partitioned by shard")
    ck.add_argument("--seq_tokens", type=int, default=2048,
                    help="pack: sequence capacity in tokens")
    ck.add_argument("--shard_bits", type=int, default=8,
                    help="pack: 2^bits parallel packing shards")
    ck.add_argument("--id_col", default="doc_id")
    ck.add_argument("--text_col", default="text")
    ck.add_argument("--cores", type=int, default=-1)
    ck.add_argument("--master", default=None)

    sd = sub.add_parser(
        "semdedup",
        help="SemDeDup semantic dedup: k-means cells over normalized "
             "embeddings, within-cell cosine drop keeping the "
             "lowest-centroid-similarity member (Abbas et al. 2023); "
             "graft-only capability")
    sd.add_argument("-i", "--input", required=True,
                    help="corpus parquet with an embedding column")
    sd.add_argument("-o", "--output", required=True)
    sd.add_argument("--threshold", type=float, default=0.95,
                    help="within-cell cosine duplicate threshold")
    sd.add_argument("--n_cells", type=int, default=16,
                    help="k-means cells (scale with corpus size: the "
                         "within-cell pass is ~n^2/n_cells)")
    sd.add_argument("--id_col", default=None,
                    help="default vec_id if present else doc_id")
    sd.add_argument("--vec_col", default="embedding")
    sd.add_argument("--seed", type=int, default=42)
    sd.add_argument("--drop", action="store_true",
                    help="also write the deduplicated corpus (keep=true "
                         "rows only) under <output>/data/")
    sd.add_argument("--cores", type=int, default=-1)
    sd.add_argument("--master", default=None)

    sk = sub.add_parser(
        "skew",
        help="shuffle diagnostics before committing to a key: hot-key "
             "census + salt sizing, or (with --join) the exact "
             "per-key join fan-out; graft-only capability")
    sk.add_argument("-i", "--input", required=True,
                    help="table parquet")
    sk.add_argument("--key", required=True,
                    help="grouping / join key column")
    sk.add_argument("--join", default=None,
                    help="right-side parquet: report per-key JOIN "
                         "output cardinality instead of a one-table "
                         "census")
    sk.add_argument("--right_key", default=None,
                    help="right side's key column (default: --key)")
    sk.add_argument("--top_k", type=int, default=10)
    sk.add_argument("--sample_fraction", type=float, default=1.0,
                    help="census only: count a u48-hash sample of "
                         "rows (requires --id_col)")
    sk.add_argument("--id_col", default=None)
    sk.add_argument("--cores", type=int, default=-1)
    sk.add_argument("--master", default=None)

    qs = sub.add_parser(
        "qscore",
        help="model-based quality scoring (distilled linear model "
             "served as a Catalyst expression; graft-only capability)")
    qs.add_argument("-i", "--input", required=True,
                    help="corpus parquet with a text column")
    qs.add_argument("-o", "--output", required=True)
    qs.add_argument("--text_col", default="text")
    qs.add_argument("--threshold", type=float, default=0.5)
    qs.add_argument("--train", action="store_true",
                    help="re-distill the model on this corpus's "
                         "heuristic labels instead of the frozen "
                         "pretrained weights; writes coefficients "
                         "to <output>/model.json")
    qs.add_argument("--cores", type=int, default=-1)
    qs.add_argument("--master", default=None)

    ph = sub.add_parser(
        "phash",
        help="compute perceptual-hash dedup keys from pixels "
             "(decode + DCT phash64), optionally canonicalized over "
             "the mirror or full-D4 orbit so flipped/rotated "
             "re-uploads collide on exact equality")
    ph.add_argument("-i", "--input", required=True,
                    help="pairs parquet (image_id, bytes, w, h, fmt)")
    ph.add_argument("-o", "--output", required=True)
    ph.add_argument("--invariance", choices=["none", "flip", "dihedral"],
                    default="none",
                    help="none = plain phash64; flip = unsigned-min of "
                         "both mirror orientations; dihedral = "
                         "unsigned-min over all 8 rotation/mirror "
                         "variants (one decode either way)")
    ph.add_argument("--cores", type=int, default=-1)
    ph.add_argument("--master", default=None)

    ds = sub.add_parser(
        "dsir",
        help="DSIR importance resampling (Xie et al. 2023): select "
             "raw-corpus documents that look like a target corpus "
             "via hashed n-gram importance weights (graft-only "
             "capability)")
    ds.add_argument("-i", "--input", required=True,
                    help="raw corpus parquet with text + id columns")
    ds.add_argument("-t", "--target", required=True,
                    help="target corpus parquet (what selected docs "
                         "should look like)")
    ds.add_argument("-o", "--output", required=True)
    ds.add_argument("-n", "--n_select", type=int, default=1000,
                    help="documents to select (Gumbel top-n)")
    ds.add_argument("--text_col", default="text")
    ds.add_argument("--id_col", default="doc_id")
    ds.add_argument("--buckets", type=int, default=512,
                    help="hashed n-gram feature buckets")
    ds.add_argument("--seed", type=int, default=0)
    ds.add_argument("--scores_only", action="store_true",
                    help="write per-doc importance scores for the "
                         "whole corpus instead of the selection")
    ds.add_argument("--cores", type=int, default=-1)
    ds.add_argument("--master", default=None)

    ms = sub.add_parser(
        "metascrub",
        help="image-payload metadata audit / strip (PNG ancillary "
             "chunks: tEXt/iTXt/zTXt, tIME, eXIf — EXIF can embed "
             "GPS); the image-side twin of the caption PII scrub "
             "(graft-only capability)")
    ms.add_argument("-i", "--input", required=True,
                    help="pairs parquet with bytes + fmt columns")
    ms.add_argument("-o", "--output", required=True)
    ms.add_argument("--bytes_col", default="bytes")
    ms.add_argument("--fmt_col", default="fmt")
    ms.add_argument("--audit_only", action="store_true",
                    help="write the audit columns without rewriting "
                         "payloads")
    ms.add_argument("--cores", type=int, default=-1)
    ms.add_argument("--master", default=None)

    dr = sub.add_parser(
        "drift",
        help="PSI score-drift monitor between two corpus versions' "
             "score columns (graft-only capability)")
    dr.add_argument("-i", "--input", required=True,
                    help="NEW corpus parquet")
    dr.add_argument("-r", "--reference", required=True,
                    help="REFERENCE corpus parquet (bucket bounds come "
                         "from this side)")
    dr.add_argument("--col", default="q_score",
                    help="numeric column to compare")
    dr.add_argument("--buckets", type=int, default=10)
    dr.add_argument("--categorical", action="store_true",
                    help="treat --col as categorical (lang, fmt, "
                         "drop_reason): PSI over the top-K reference "
                         "categories, tail pooled into __other__, "
                         "NULL its own __null__ category")
    dr.add_argument("--top_k", type=int, default=20,
                    help="categorical mode: number of reference-side "
                         "categories kept before pooling")
    dr.add_argument("--cores", type=int, default=-1)
    dr.add_argument("--master", default=None)

    xp = sub.add_parser(
        "expect",
        help="declarative data-quality expectations over a corpus: "
             "one-pass rule report, optional row-level quarantine "
             "split; exits 1 when any rule fails (graft-only "
             "capability)")
    xp.add_argument("-i", "--input", required=True,
                    help="corpus parquet")
    xp.add_argument("--not_null", action="append", default=[],
                    metavar="COL")
    xp.add_argument("--unique", action="append", default=[],
                    metavar="COL", help="table-level; excluded from "
                                        "--quarantine row enforcement")
    xp.add_argument("--range", action="append", default=[],
                    metavar="COL:LO:HI",
                    help="closed numeric interval; NULL passes")
    xp.add_argument("--matches", action="append", default=[],
                    metavar="COL:REGEX",
                    help="rlike search (anchor with ^...$ for a full "
                         "match); NULL passes")
    xp.add_argument("--in_set", action="append", default=[],
                    metavar="COL:V1,V2,...",
                    help="membership over literal strings; NULL passes")
    xp.add_argument("--max_fail", type=float, default=0.0,
                    help="tolerated violation fraction applied to "
                         "every rule (default 0 = strict)")
    xp.add_argument("--quarantine", default=None,
                    help="also write clean/ and quarantine/ parquet "
                         "under this dir (row rules only; quarantine "
                         "rows carry failed_expectations)")
    xp.add_argument("--cores", type=int, default=-1)
    xp.add_argument("--master", default=None)

    em = sub.add_parser(
        "evalmodel",
        help="score-column quality report: group-wise ROC-AUC "
             "(Mann-Whitney midranks), best-F1 operating point from a "
             "threshold sweep, and — when the score is a probability "
             "— a calibration/reliability table (graft-only "
             "capability)")
    em.add_argument("-i", "--input", required=True,
                    help="parquet with score + boolean label columns")
    em.add_argument("--score_col", required=True)
    em.add_argument("--label_col", required=True)
    em.add_argument("--group_col", default=None)
    em.add_argument("--lo", type=float, default=None,
                    help="sweep grid lower edge (default: data min)")
    em.add_argument("--hi", type=float, default=None,
                    help="sweep grid upper edge (default: data max + "
                         "epsilon)")
    em.add_argument("--bins", type=int, default=20)
    em.add_argument("--prob", action="store_true",
                    help="score is a probability in [0,1]: also emit "
                         "the calibration table + ECE")
    em.add_argument("--cores", type=int, default=-1)
    em.add_argument("--master", default=None)

    mn = sub.add_parser(
        "mine",
        help="margin-based pair mining between two corpora: forward "
             "kNN candidates scored with the Artetxe & Schwenk ratio "
             "margin (cos over the mean of both sides' k-NN cosine "
             "averages) — bitext / caption-transfer / soft-dup pair "
             "mining (graft-only capability)")
    mn.add_argument("-i", "--input", required=True,
                    help="QUERY corpus parquet (id + embedding)")
    mn.add_argument("-r", "--reference", required=True,
                    help="INDEX corpus parquet (id + embedding)")
    mn.add_argument("-o", "--output", required=True)
    mn.add_argument("--vec_col", default="embedding")
    mn.add_argument("--query_id_col", default="vec_id",
                    help="id column in the query corpus")
    mn.add_argument("--index_id_col", default="vec_id",
                    help="id column in the index corpus")
    mn.add_argument("-k", type=int, default=4,
                    help="kNN depth for candidates AND margin "
                         "denominators")
    mn.add_argument("--threshold", type=float, default=1.05,
                    help="ratio-margin cutoff (CCMatrix-style mining "
                         "uses ~1.05-1.06)")
    mn.add_argument("--method", choices=["lsh", "exact"], default="lsh",
                    help="lsh = bucket-key ANN joins (the at-scale "
                         "path); exact = guarded cross-join baseline")
    mn.add_argument("--n_planes", type=int, default=8)
    mn.add_argument("--probe_hamming", type=int, default=2)
    mn.add_argument("--cores", type=int, default=-1)
    mn.add_argument("--master", default=None)

    sw = sub.add_parser(
        "sweep",
        help="filter-threshold calibration: precision/recall/F1 of "
             "'keep score_col >= t' against a boolean reference "
             "column over a fixed-width threshold grid, optionally "
             "one curve per group — the tuning report for gate knobs "
             "like the per-language ppl thresholds (graft-only "
             "capability)")
    sw.add_argument("-i", "--input", required=True,
                    help="parquet with the score + label columns")
    sw.add_argument("--score_col", required=True)
    sw.add_argument("--label_col", required=True,
                    help="boolean reference column")
    sw.add_argument("--lo", type=float, required=True,
                    help="grid lower edge (inclusive)")
    sw.add_argument("--hi", type=float, required=True,
                    help="grid upper edge (exclusive)")
    sw.add_argument("--bins", type=int, default=20)
    sw.add_argument("--group_col", default=None,
                    help="one independent curve per value (e.g. lang)")
    sw.add_argument("--cores", type=int, default=-1)
    sw.add_argument("--master", default=None)

    tk = sub.add_parser(
        "tokenize",
        help="train a tokenizer on the corpus and/or encode it: "
             "BPE (Sennrich 2016) or unigram-LM (Kudo 2018), both "
             "distributed and bit-deterministic (graft-only "
             "capability)")
    tk.add_argument("-i", "--input", required=True,
                    help="corpus parquet with a text column")
    tk.add_argument("-o", "--output", required=True)
    tk.add_argument("--algo", choices=["bpe", "unigram"],
                    default="unigram")
    tk.add_argument("--text_col", default="text")
    tk.add_argument("--vocab_size", type=int, default=160,
                    help="unigram: pieces kept after pruning")
    tk.add_argument("--n_merges", type=int, default=40,
                    help="bpe: merge rounds")
    tk.add_argument("--model", default=None,
                    help="encode with an existing model.json instead "
                         "of training on this corpus")
    tk.add_argument("--cores", type=int, default=-1)
    tk.add_argument("--master", default=None)

    oo = sub.add_parser(
        "optout",
        help="opt-out / do-not-train compliance gate: drop or label "
             "rows whose URL's domain (or any parent domain) appears "
             "on an opt-out list (graft-only capability)")
    oo.add_argument("-i", "--input", required=True,
                    help="corpus parquet with a URL column")
    oo.add_argument("-o", "--output", required=True)
    oo.add_argument("--list", dest="optout_list", required=True,
                    help="newline-delimited domain file (parent "
                         "domains cover subdomains; dot-boundary "
                         "match, never substring)")
    oo.add_argument("--url_col", default="url")
    oo.add_argument("--id_col", default="doc_id",
                    help="unique row key (required by the big-list "
                         "join path)")
    oo.add_argument("--label", action="store_true",
                    help="append an opted_out boolean instead of "
                         "dropping (audit-before-delete)")
    oo.add_argument("--cores", type=int, default=-1)
    oo.add_argument("--master", default=None)

    ex = sub.add_parser(
        "export",
        help="training-export shard writer: deterministic global "
             "shuffle + one size-balanced parquet file per shard "
             "(graft-only capability)")
    ex.add_argument("-i", "--input", required=True,
                    help="curated corpus parquet")
    ex.add_argument("-o", "--output", required=True)
    g = ex.add_mutually_exclusive_group()
    g.add_argument("--n_shards", type=int, default=None)
    g.add_argument("--target_bytes", type=int, default=None,
                   help="derive the shard count from the payload size")
    ex.add_argument("--format", dest="shard_format",
                    choices=["parquet", "wds"], default="parquet",
                    help="parquet = one parquet file per shard; wds = "
                         "WebDataset-style tar shards (<id>.img + "
                         "<id>.json members)")
    ex.add_argument("--id_col", default="image_id")
    ex.add_argument("--bytes_col", default="bytes")
    ex.add_argument("--seed", type=int, default=0)
    ex.add_argument("--resume", action="store_true",
                    help="wds only: rewrite only shards missing or "
                         "size-mismatched on disk (deterministic plan "
                         "makes the completion exact)")
    ex.add_argument("--verify", action="store_true",
                    help="verify an existing export against its "
                         "_manifest.json (distributed re-hash / "
                         "recount) and exit non-zero on damage")
    ex.add_argument("--cores", type=int, default=-1)
    ex.add_argument("--master", default=None)

    rz = sub.add_parser(
        "resize",
        help="resize-and-re-encode image payloads: cap the longest "
             "(or shortest) side with the deterministic bilinear "
             "kernel, pass small images through byte-identical, "
             "optionally recompute phash over the resized pixels "
             "(graft-only capability)")
    rz.add_argument("-i", "--input", required=True,
                    help="pairs parquet (image_id, bytes, w, h, fmt, ...)")
    rz.add_argument("-o", "--output", required=True)
    rz.add_argument("--target", type=int, default=256)
    rz.add_argument("--mode", choices=["longest", "shortest", "exact"],
                    default="longest")
    rz.add_argument("--upscale", action="store_true",
                    help="also scale images below the bound up to it")
    rz.add_argument("--out_fmt", default=None,
                    choices=["raw", "bmp", "png", "jpegq"],
                    help="convert format while resizing (default: keep)")
    rz.add_argument("--rehash", action="store_true",
                    help="recompute the phash column from the resized "
                         "pixels (resizing moves DCT coefficients)")
    rz.add_argument("--invariance",
                    choices=["none", "flip", "dihedral"], default="none",
                    help="--rehash canonicalization: flip = mirror-"
                         "canonical, dihedral = full-D4-orbit canonical "
                         "(same semantics as the phash subcommand)")
    rz.add_argument("--crop", action="store_true",
                    help="crop uniform borders (letterbox/pillarbox) "
                         "BEFORE resizing; adds cropped/crop_* columns")
    rz.add_argument("--crop_tol", type=int, default=8)
    rz.add_argument("--no_validate", action="store_true",
                    help="skip the decode check on pass-through rows")
    rz.add_argument("--cores", type=int, default=-1)
    rz.add_argument("--master", default=None)

    pk = sub.add_parser("package", help="build the --py-files zip")
    pk.add_argument("-o", "--output", default="mehc_curation_spark.zip")

    pl = sub.add_parser(
        "pipeline", help="run a multi-step JSON pipeline spec (each "
                         "step is one CLI subcommand in its own "
                         "subprocess/SparkSession; completed steps "
                         "skip on re-run; $prev/$name path "
                         "substitution chains outputs)")
    pl.add_argument("--spec", required=True, help="pipeline spec JSON")
    pl.add_argument("--no_resume", action="store_true",
                    help="re-run every step even if recorded complete")
    pl.add_argument("--timeout_per_step", type=float, default=3600.0)

    tm = sub.add_parser(
        "table", help="snapshot-table maintenance (compact / expire / "
                      "orphans / history) and row-level changes "
                      "(delete / takedown / update / merge — "
                      "copy-on-write, only affected files rewritten)")
    tm.add_argument("action",
                    choices=["compact", "expire", "orphans", "history",
                             "delete", "takedown", "update", "merge",
                             "diff", "tag", "untag", "rollback",
                             "branch", "dropbranch", "publish",
                             "apply_deletes", "health", "maintain"])
    tm.add_argument("-o", "--output", required=True,
                    help="table path (a run_curate/SnapshotTable output)")
    tm.add_argument("--target_files", type=int, default=8,
                    help="compact: files to coalesce into")
    tm.add_argument("--cluster_by", default=None,
                    help="compact: comma-separated numeric columns to "
                         "Z-ORDER the rewrite by (every output file "
                         "covers a tight range in ALL of them; range "
                         "reads on any prune files)")
    tm.add_argument("--keep_last", type=int, default=2,
                    help="expire/maintain: snapshots to keep")
    tm.add_argument("--small_file_mb", type=int, default=32,
                    help="health/maintain: files under this size count "
                         "as small-file pressure (default 32 MiB)")
    tm.add_argument("--where", default=None,
                    help="delete/update: SQL predicate (rows where it "
                         "is TRUE are deleted / updated)")
    tm.add_argument("--mor", action="store_true",
                    help="delete: merge-on-read — record the matched "
                         "keys in a small delete file instead of "
                         "rewriting data files (O(keys) takedown "
                         "latency at any table size; reads mask the "
                         "keys until 'apply_deletes' or 'compact' "
                         "settles the debt). merge: append the source "
                         "rows + their keys as a sequence-scoped "
                         "equality delete in ONE commit — O(source) "
                         "upsert with no table scan or rewrite")
    tm.add_argument("--mor_pos", action="store_true",
                    help="delete: merge-on-read POSITION flavor — "
                         "record the matched rows' (file, row-ordinal) "
                         "coordinates; masks exactly those rows, so it "
                         "also addresses NULL/duplicate keys. "
                         "Copy-on-write rewrites refuse until the debt "
                         "is settled")
    tm.add_argument("--set", action="append", default=[],
                    metavar="COL=SQL_EXPR",
                    help="update: assignment, repeatable "
                         "(e.g. --set \"caption=regexp_replace(caption,"
                         "'[0-9]','#')\")")
    tm.add_argument("--ids", default=None,
                    help="takedown: newline-delimited id file, or a "
                         "comma-separated literal list")
    tm.add_argument("--id_col", default="image_id",
                    help="takedown: id column (default image_id)")
    tm.add_argument("--source", default=None,
                    help="merge: parquet path of upsert rows (full "
                         "table schema; key-matched rows replaced, "
                         "the rest inserted)")
    tm.add_argument("--key", default="image_id",
                    help="merge: key column (default image_id)")
    tm.add_argument("--from_version", type=int, default=None,
                    help="diff: base snapshot version")
    tm.add_argument("--to_version", type=int, default=None,
                    help="diff: target snapshot version "
                         "(default current)")
    tm.add_argument("--diff_out", default=None,
                    help="diff: optional parquet path for the "
                         "changelog rows (else counts only)")
    tm.add_argument("--name", default=None,
                    help="tag/untag: tag name (tagged snapshots "
                         "survive expire until untagged)")
    tm.add_argument("--at", default=None,
                    help="tag: version to pin (default current); "
                         "rollback: target version or tag name")
    tm.add_argument("--rebase", action="store_true",
                    help="publish: when main advanced while the audit "
                         "branch held staged work (fast-forward would "
                         "refuse with 'diverged'), re-apply the "
                         "branch's append-only delta as one new commit "
                         "on main's head; refused if the branch did "
                         "anything but append (see MIGRATION.md 'WAP "
                         "conflict contract')")
    tm.add_argument("--cores", type=int, default=-1)
    tm.add_argument("--master", default=None)
    return p


def _tile_count(threshold, grid: int = 4) -> int:
    """Validate a --threshold reused as a matching-tile COUNT (tile
    modes): must be an integer in 1..grid^2 — a similarity-style
    fraction like 0.9 would int() to 0 and pass every bucket-sharing
    pair, which with --drop/--keep_reps deletes unrelated images."""
    n = grid * grid
    if threshold is None:
        return min(6, n)
    try:
        t = int(threshold)
        ok = (t == threshold and 1 <= t <= n)
    except (ValueError, OverflowError):  # NaN / inf survive type=float
        ok = False
    if not ok:
        raise SystemExit(
            f"--threshold for tile matching is a matching-tile COUNT: "
            f"an integer in 1..{n} (default 6), got {threshold}")
    return int(threshold)


def _takedown_ids(spec: str, table_path: str, id_col: str) -> list:
    """Resolve --ids (file or comma list) to typed values matching the
    table's pinned id-column type (CLI args arrive as strings; a long
    id column must compare against longs, not strings)."""
    from mehc_curation_spark.io.catalog import SnapshotTable

    if os.path.isfile(spec):
        with open(spec) as f:
            raw = [ln.strip() for ln in f if ln.strip()]
    else:
        raw = [s.strip() for s in spec.split(",") if s.strip()]
    schema = SnapshotTable(table_path).manifest().get("schema")
    typ = next((f["type"] for f in json.loads(schema)["fields"]
                if f["name"] == id_col), "string") if schema else "string"
    if typ in ("long", "integer", "short", "byte"):
        return [int(v) for v in raw]
    if typ in ("double", "float"):
        return [float(v) for v in raw]
    return raw


def build_pyfiles_zip(out_path: str) -> str:
    """Zip the package for spark-submit --py-files."""
    root = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    rel = os.path.join("mehc_curation_spark",
                                       os.path.relpath(full, root))
                    z.write(full, rel)
    return out_path


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.cmd == "package":
        path = build_pyfiles_zip(args.output)
        print(json.dumps({"py_files": path}))
        return 0

    if args.cmd == "pipeline":
        if not os.path.exists(args.spec):
            sys.stderr.write(
                f"error: --spec path does not exist: {args.spec}\n")
            return 2
        from mehc_curation_spark.pipeline import run_pipeline

        summary = run_pipeline(args.spec, resume=not args.no_resume,
                               timeout_per_step=args.timeout_per_step)
        print(json.dumps(summary))
        return 0 if summary["ok"] else 1

    if args.cmd == "table" and args.action in (
            "orphans", "history", "expire", "tag", "untag", "rollback",
            "branch", "dropbranch", "publish", "health"):
        # metadata/filesystem-only actions need no SparkSession
        from mehc_curation_spark.io.catalog import SnapshotTable

        t = SnapshotTable(args.output)
        if args.action == "health":
            print(json.dumps(t.health(
                small_file_bytes=args.small_file_mb << 20)))
        elif args.action == "orphans":
            print(json.dumps({"orphans_removed": t.remove_orphan_files()}))
        elif args.action == "expire":
            removed = t.expire_snapshots(keep_last=args.keep_last)
            print(json.dumps({"files_removed": removed,
                              "current": t.current_version()}))
        elif args.action == "tag":
            if not args.name:
                raise SystemExit("table tag requires --name")
            at = (int(args.at) if args.at and args.at.isdigit()
                  else args.at)
            v = t.tag(args.name, at)
            print(json.dumps({"tag": args.name, "version": v}))
        elif args.action == "untag":
            if not args.name:
                raise SystemExit("table untag requires --name")
            t.drop_tag(args.name)
            print(json.dumps({"untagged": args.name,
                              "tags": t.tags()}))
        elif args.action == "rollback":
            if args.at is None:
                raise SystemExit("table rollback requires --at "
                                 "(version or tag)")
            target = int(args.at) if args.at.isdigit() else args.at
            v = t.rollback(target)
            print(json.dumps({"rolled_back_to": t.resolve_ref(target),
                              "new_version": v}))
        elif args.action == "branch":
            if not args.name:
                raise SystemExit("table branch requires --name")
            at = (int(args.at) if args.at and args.at.isdigit()
                  else args.at)
            v = t.create_branch(args.name, at)
            print(json.dumps({"branch": args.name, "head": v,
                              "branches": t.branches()}))
        elif args.action == "dropbranch":
            if not args.name:
                raise SystemExit("table dropbranch requires --name")
            t.drop_branch(args.name)
            print(json.dumps({"dropped": args.name,
                              "branches": t.branches()}))
        elif args.action == "publish":
            if not args.name:
                raise SystemExit("table publish requires --name "
                                 "(the audited branch to fast-forward "
                                 "main to)")
            if args.rebase:
                v = t.rebase_publish(args.name, onto="main")
            else:
                v = t.fast_forward("main", args.name)
            print(json.dumps({"published": args.name, "main_head": v,
                              "rebased": bool(args.rebase),
                              "branches": t.branches()}))
        else:
            hist = []
            for v in range(1, t.current_version() + 1):
                if not os.path.exists(t._manifest_path(v)):
                    continue
                m = t.manifest(v)
                hist.append({"version": v, "files": len(m["files"]),
                             "properties": m.get("properties", {})})
            print(json.dumps({"current": t.current_version(),
                              "read_head": t._branch_head(),
                              "snapshots": hist,
                              "tags": t.tags(),
                              "branches": t.branches()}))
        return 0

    # Friendly missing-path errors BEFORE paying Spark startup: a bad
    # -i/-r/-t otherwise surfaces as a raw AnalysisException traceback
    # deep inside the job (documented friction in the verify recipe).
    # Only plain local paths are checked — URIs (scheme://) and globs
    # are the storage layer's business.
    for attr, flag in (("input", "-i/--input"),
                       ("reference", "-r/--reference"),
                       ("target", "-t/--target")):
        p = getattr(args, attr, None)
        if (isinstance(p, str) and p and "://" not in p
                and not any(ch in p for ch in "*?[")
                and not os.path.exists(p)):
            sys.stderr.write(
                f"error: {flag} path does not exist: {p}\n")
            return 2

    from mehc_curation_spark.session import get_spark

    spark = get_spark(f"mehc-{args.cmd}", master=args.master, cores=args.cores)
    try:
        if args.cmd == "table":  # compact (the only Spark-needing action)
            from mehc_curation_spark.io.catalog import SnapshotTable

            t = SnapshotTable(args.output)
            if (args.action == "compact"
                    and os.path.isdir(os.path.join(args.output, "_state"))):
                # incrementally-curated table: bucket-aware compaction
                # of the labels table + its state sidecar. ONLY the
                # compact action reroutes — a takedown/diff/etc. on an
                # incremental table must run (or refuse) as itself,
                # never silently compact instead.
                from mehc_curation_spark.stages.incremental import (
                    compact_increments,
                )

                if args.cluster_by:
                    raise SystemExit(
                        "table compact --cluster_by does not apply to "
                        "incrementally-curated tables (their layout is "
                        "one file per phash bucket, owned by the "
                        "increment state); compact without --cluster_by"
                    )
                if args.target_files != 8:
                    print("note: --target_files does not apply to "
                          "incremental tables (always one file per "
                          "bucket)", file=sys.stderr)
                print(json.dumps(compact_increments(spark, args.output)))
                return 0
            if args.action == "compact":
                cb = (tuple(s.strip() for s in args.cluster_by.split(",")
                            if s.strip())
                      if args.cluster_by else None)
                v = t.compact(spark, target_files=args.target_files,
                              cluster_by=cb)
                print(json.dumps({"compacted_version": v,
                                  "files": len(t.manifest(v)["files"]),
                                  **({"cluster_by": list(cb)} if cb
                                     else {})}))
                return 0
            if args.action == "diff":
                from pyspark.sql import functions as F

                if args.from_version is None:
                    raise SystemExit("table diff requires --from_version")
                d = t.snapshot_diff(spark, args.from_version,
                                    args.to_version, id_col=args.id_col)
                if args.diff_out:
                    d.write.mode("overwrite").parquet(args.diff_out)
                    d = spark.read.parquet(args.diff_out)
                per = {r["_change_type"]: r["n"] for r in
                       d.groupBy("_change_type")
                        .agg(F.count("*").alias("n")).collect()}
                print(json.dumps({
                    "from": args.from_version,
                    "to": (args.to_version if args.to_version is not None
                           else t.current_version()),
                    "counts": {k: per.get(k, 0) for k in
                               ("insert", "delete", "update_before",
                                "update_after")}}))
                return 0
            before = t.current_version()
            if args.action == "maintain":
                print(json.dumps(t.maintain(
                    spark, target_files=args.target_files,
                    keep_last=args.keep_last,
                    small_file_bytes=args.small_file_mb << 20)))
                return 0
            if args.action == "apply_deletes":
                pending = len(t.manifest().get("deletes") or [])
                v = t.apply_deletes(spark)
                print(json.dumps({"action": "apply_deletes",
                                  "version": v, "changed": v != before,
                                  "settled_delete_files": pending}))
                return 0
            if args.action == "delete":
                if not args.where:
                    raise SystemExit("table delete requires --where")
                if args.mor and args.mor_pos:
                    raise SystemExit(
                        "--mor and --mor_pos are mutually exclusive")
                mode = ("mor_pos" if args.mor_pos
                        else "mor" if args.mor else "cow")
                v = t.delete_where(spark, args.where, mode=mode,
                                   key_cols=(args.id_col,))
            elif args.action == "takedown":
                if args.mor or args.mor_pos:
                    raise SystemExit(
                        "--mor applies to 'delete'; takedown by id is "
                        "already file-pruned copy-on-write (use delete "
                        "--where \"id_col in (...)\" --mor for a "
                        "merge-on-read takedown)")
                if not args.ids:
                    raise SystemExit("table takedown requires --ids")
                ids = _takedown_ids(args.ids, args.output, args.id_col)
                v = t.delete_ids(spark, args.id_col, ids)
            elif args.action == "update":
                if not args.where or not args.set:
                    raise SystemExit(
                        "table update requires --where and --set")
                if args.mor_pos:
                    raise SystemExit(
                        "--mor_pos applies to 'delete'; update "
                        "supports --mor (append updated rows + "
                        "equality-delete their keys in one commit)")
                assigns = {}
                for a in args.set:
                    col, _, expr = a.partition("=")
                    if not _:
                        raise SystemExit(f"bad --set (want COL=EXPR): {a}")
                    assigns[col.strip()] = expr
                v = t.update_where(spark, args.where, assigns,
                                   mode="mor" if args.mor else "cow",
                                   key_cols=(args.id_col,))
            else:  # merge
                if not args.source:
                    raise SystemExit("table merge requires --source")
                if args.mor_pos:
                    raise SystemExit(
                        "--mor_pos applies to 'delete'; merge "
                        "supports --mor (append + equality-delete "
                        "keys in one commit)")
                v = t.merge_upsert(spark, spark.read.parquet(args.source),
                                   args.key,
                                   mode="mor" if args.mor else "cow")
            print(json.dumps({"action": args.action, "version": v,
                              "changed": v != before,
                              "files": len(t.manifest(v)["files"]),
                              "pending_delete_files":
                                  len(t.manifest(v).get("deletes") or [])}))
            return 0

        if args.cmd == "tokenize":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators import vocab as V

            df = spark.read.parquet(args.input)
            if args.model:
                with open(args.model) as f:
                    model = json.load(f)
                if model["algo"] != args.algo:
                    raise SystemExit(
                        f"--model is a {model['algo']} model; "
                        f"--algo {args.algo} was requested")
            elif args.algo == "bpe":
                model = {"algo": "bpe",
                         "merges": [list(m) for m in V.bpe_train(
                             df, args.text_col,
                             n_merges=args.n_merges)]}
            else:
                model = {"algo": "unigram",
                         "vocab": [[p, u] for p, u in V.unigram_train(
                             df, args.text_col,
                             vocab_size=args.vocab_size)]}
            os.makedirs(args.output, exist_ok=True)
            with open(os.path.join(args.output, "model.json"), "w") as f:
                json.dump(model, f, indent=1, sort_keys=True)
            enc = (V.bpe_encode_udf([tuple(m) for m in model["merges"]])
                   if model["algo"] == "bpe" else
                   V.unigram_encode_udf([tuple(v) for v in
                                         model["vocab"]]))
            tok_path = os.path.join(args.output, "tokens")
            (df.withColumn("tokens", enc(F.col(args.text_col)))
               .write.mode("overwrite").parquet(tok_path))
            agg = (spark.read.parquet(tok_path)
                   .agg(F.count("*").alias("n"),
                        F.sum(F.size("tokens")).alias("total_tokens"))
                   .first())
            print(json.dumps({
                "algo": model["algo"],
                "model_size": (len(model.get("merges", []))
                               or len(model.get("vocab", []))),
                "rows": agg["n"],
                "total_tokens": int(agg["total_tokens"] or 0)}))
            return 0
        if args.cmd == "optout":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.compliance import (
                apply_optout,
            )

            with open(args.optout_list) as f:
                domains = [ln.strip() for ln in f if ln.strip()]
            df = spark.read.parquet(args.input)
            opt = spark.createDataFrame([(d,) for d in domains],
                                        "domain string") \
                if domains else spark.createDataFrame([], "domain string")
            out = apply_optout(df, args.url_col, opt,
                               action="label" if args.label else "drop",
                               id_col=args.id_col)
            data_path = os.path.join(args.output, "data")
            out.write.mode("overwrite").parquet(data_path)
            written = spark.read.parquet(data_path)
            n_in = df.count()
            n_out = written.count()
            summary = {"rows_in": n_in, "rows_out": n_out,
                       "list_entries": len(domains),
                       "mode": "label" if args.label else "drop"}
            if args.label:
                summary["opted_out"] = written.filter(
                    F.col("opted_out")).count()
            else:
                summary["dropped"] = n_in - n_out
            print(json.dumps(summary))
            return 0
        if args.cmd == "phash":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.multimodal import (
                compute_phash,
            )

            df = spark.read.parquet(args.input)
            hashed = compute_phash(
                df,
                flip_invariant=args.invariance == "flip",
                dihedral_invariant=args.invariance == "dihedral")
            out = os.path.join(args.output, "hashes")
            hashed.write.mode("overwrite").parquet(out)
            agg = (spark.read.parquet(out)
                   .agg(F.count("*").alias("n"),
                        F.sum(F.col("decode_ok").cast("int"))
                        .alias("decoded"),
                        F.countDistinct("phash_computed")
                        .alias("distinct_hashes"))
                   .first())
            print(json.dumps({"rows": agg["n"],
                              "decoded": int(agg["decoded"]),
                              "failed": agg["n"] - int(agg["decoded"]),
                              "distinct_hashes": agg["distinct_hashes"],
                              "invariance": args.invariance}))
            return 0

        if args.cmd == "qscore":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.quality_model import (
                PRETRAINED,
                heuristic_labels,
                score_quality,
                train_quality_model,
            )

            df = spark.read.parquet(args.input)
            coef = PRETRAINED
            if args.train:
                coef = train_quality_model(
                    heuristic_labels(df, args.text_col), args.text_col)
                os.makedirs(args.output, exist_ok=True)
                with open(os.path.join(args.output, "model.json"),
                          "w") as f:
                    json.dump(coef, f, indent=2, sort_keys=True)
            scored = score_quality(df, args.text_col, coef,
                                   threshold=args.threshold)
            scored.write.mode("overwrite").parquet(
                os.path.join(args.output, "scores"))
            agg = (spark.read.parquet(os.path.join(args.output, "scores"))
                   .agg(F.count("*").alias("n"),
                        F.sum(F.col("q_keep").cast("int")).alias("kept"),
                        F.round(F.avg("q_score"), 4).alias("mean_score"))
                   .first())
            print(json.dumps({"rows": agg["n"], "kept": int(agg["kept"]),
                              "mean_score": agg["mean_score"],
                              "trained": bool(args.train),
                              "threshold": args.threshold}))
            return 0

        if args.cmd == "drift":
            from mehc_curation_spark.operators.profile import (
                category_drift,
                score_drift,
            )

            ref = spark.read.parquet(args.reference)
            new = spark.read.parquet(args.input)
            if args.categorical:
                rows = category_drift(ref, new, args.col,
                                      top_k=args.top_k).collect()
                key = "category"
            else:
                rows = score_drift(ref, new, args.col,
                                   n_buckets=args.buckets).collect()
                key = "bucket"
            detail = [{key: r[key], "n_ref": r["n_ref"],
                       "n_new": r["n_new"],
                       "psi_contrib": r["psi_contrib"]}
                      for r in rows]
            psi = round(sum(r["psi_contrib"] for r in rows), 6)
            verdict = ("stable" if psi < 0.1
                       else "moderate" if psi < 0.25 else "investigate")
            print(json.dumps({
                "psi": psi, "verdict": verdict, "col": args.col,
                "buckets": detail}))
            return 0

        if args.cmd == "expect":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.expectations import (
                enforce_expectations,
                expect_in_range,
                expect_in_set,
                expect_matches,
                expect_not_null,
                expect_unique,
                expectation_report,
            )

            def _split2(spec: str, what: str) -> tuple[str, str]:
                col, sep, rest = spec.partition(":")
                if not sep or not col or not rest:
                    raise SystemExit(
                        f"expect: bad --{what} spec {spec!r} "
                        f"(want COL:{what.upper()})")
                return col, rest

            mf = args.max_fail
            rules = []
            for c in args.not_null:
                rules.append(expect_not_null(c, max_fail_fraction=mf))
            for c in args.unique:
                rules.append(expect_unique(c, max_fail_fraction=mf))
            for spec in args.range:
                col, rest = _split2(spec, "range")
                try:
                    lo, hi = (float(x) for x in rest.split(":", 1))
                except ValueError:
                    raise SystemExit(
                        f"expect: bad --range spec {spec!r} "
                        f"(want COL:LO:HI)")
                rules.append(expect_in_range(col, lo, hi,
                                             max_fail_fraction=mf))
            for spec in args.matches:
                col, pat = _split2(spec, "matches")
                rules.append(expect_matches(col, pat,
                                            max_fail_fraction=mf))
            for spec in args.in_set:
                col, vals = _split2(spec, "in_set")
                rules.append(expect_in_set(col, vals.split(","),
                                           max_fail_fraction=mf))
            if not rules:
                raise SystemExit(
                    "expect: no rules given (--not_null / --unique / "
                    "--range / --matches / --in_set)")

            df = spark.read.parquet(args.input)
            report = [r.asDict() for r in
                      expectation_report(df, rules).collect()]
            out = {"n_rules": len(report),
                   "all_passed": all(r["passed"] for r in report),
                   "rules": report}
            if args.quarantine:
                row_rules = [r for r in rules if r.predicate is not None]
                if not row_rules:
                    raise SystemExit(
                        "expect: --quarantine needs at least one "
                        "row-level rule (--unique is table-level)")
                clean, quar = enforce_expectations(df, row_rules)
                cdir = os.path.join(args.quarantine, "clean")
                qdir = os.path.join(args.quarantine, "quarantine")
                clean.write.mode("overwrite").parquet(cdir)
                (quar.withColumn(
                    "failed_expectations",
                    F.array_join("failed_expectations", ","))
                 .write.mode("overwrite").parquet(qdir))
                out["clean_rows"] = spark.read.parquet(cdir).count()
                out["quarantine_rows"] = spark.read.parquet(qdir).count()
                out["clean_dir"] = cdir
                out["quarantine_dir"] = qdir
            print(json.dumps(out))
            return 0 if out["all_passed"] else 1

        if args.cmd == "evalmodel":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.profile import (
                auc_report,
                calibration_report,
                threshold_sweep,
            )

            df = spark.read.parquet(args.input)
            auc_rows = [r.asDict() for r in auc_report(
                df, args.score_col, args.label_col,
                group_col=args.group_col).collect()]

            lo, hi = args.lo, args.hi
            if lo is None or hi is None:
                c = F.col(args.score_col).cast("double")
                b = (df.filter(c.isNotNull() & ~F.isnan(c))
                     .agg(F.min(c).alias("lo"),
                          F.max(c).alias("hi")).first())
                if b["lo"] is None:
                    raise SystemExit("evalmodel: no non-NULL scores")
                if lo is None:
                    lo = float(b["lo"])
                if hi is None:
                    # half-open grid: nudge past the max so the top
                    # score lands in the last bin, not outside it
                    hi = float(b["hi"]) + max(
                        1e-9, abs(float(b["hi"])) * 1e-9)
            sweep_rows = [r.asDict() for r in threshold_sweep(
                df, args.score_col, args.label_col, lo=lo, hi=hi,
                n_bins=args.bins, group_col=args.group_col).collect()]
            gkey = args.group_col
            best: dict = {}
            for r in sorted(sweep_rows,
                            key=lambda r: (str(r.get(gkey, "")),
                                           r["threshold"])):
                g = r.get(gkey) if gkey else "__all__"
                b2 = best.get(g)
                if r["f1"] is not None and (b2 is None
                                            or r["f1"] > b2["f1"]):
                    best[g] = {"threshold": r["threshold"],
                               "f1": r["f1"], "precision": r["precision"],
                               "recall": r["recall"]}

            out = {"score_col": args.score_col,
                   "label_col": args.label_col,
                   "group_col": gkey,
                   "auc": auc_rows, "best_f1": best}
            if args.prob:
                cal = [r.asDict() for r in calibration_report(
                    df, args.score_col, args.label_col,
                    n_bins=args.bins).collect()]
                n_total = sum(r["n"] for r in cal)
                ece = (round(sum(r["n"] * r["gap"] for r in cal)
                             / n_total, 6) if n_total else None)
                out["calibration"] = cal
                out["ece"] = ece
            print(json.dumps(out))
            return 0

        if args.cmd == "mine":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.similarity import (
                margin_mine,
            )

            qdf = spark.read.parquet(args.input).select(
                F.col(args.query_id_col).alias("query_id"),
                F.col(args.vec_col).alias("_v")
            ).withColumnRenamed("_v", args.vec_col)
            idx = spark.read.parquet(args.reference).select(
                F.col(args.index_id_col).alias("index_id"),
                F.col(args.vec_col).alias("_v")
            ).withColumnRenamed("_v", args.vec_col)
            pairs = margin_mine(qdf, idx, args.vec_col,
                                "query_id", "index_id", k=args.k,
                                threshold=args.threshold,
                                method=args.method,
                                n_planes=args.n_planes,
                                probe_hamming=args.probe_hamming)
            out_dir = os.path.join(args.output, "data")
            pairs.write.mode("overwrite").parquet(out_dir)
            back = spark.read.parquet(out_dir)
            agg = back.agg(
                F.count("*").alias("n_pairs"),
                F.countDistinct("query_id").alias("n_queries_matched"),
                F.round(F.max("margin"), 6).alias("max_margin"),
                F.round(F.avg("margin"), 6).alias("mean_margin")).first()
            print(json.dumps({
                "n_pairs": agg["n_pairs"],
                "n_queries_matched": agg["n_queries_matched"],
                "max_margin": agg["max_margin"],
                "mean_margin": agg["mean_margin"],
                "k": args.k, "threshold": args.threshold,
                "method": args.method}))
            return 0

        if args.cmd == "sweep":
            from mehc_curation_spark.operators.profile import (
                threshold_sweep,
            )

            df = spark.read.parquet(args.input)
            res = threshold_sweep(df, args.score_col, args.label_col,
                                  lo=args.lo, hi=args.hi,
                                  n_bins=args.bins,
                                  group_col=args.group_col)
            rows = [r.asDict() for r in res.collect()]
            gkey = args.group_col
            # best-F1 cutoff per curve (ties -> lowest threshold):
            # the number a user actually sets the gate to
            best: dict = {}
            for r in sorted(rows, key=lambda r: (r.get(gkey, ""),
                                                 r["threshold"])):
                g = r.get(gkey) if gkey else "__all__"
                b = best.get(g)
                if r["f1"] is not None and (b is None
                                            or r["f1"] > b["f1"]):
                    best[g] = {"threshold": r["threshold"],
                               "f1": r["f1"]}
            print(json.dumps({
                "score_col": args.score_col,
                "label_col": args.label_col,
                "group_col": gkey, "bins": args.bins,
                "lo": args.lo, "hi": args.hi,
                "best_f1": best, "curve": rows}))
            return 0

        if args.cmd == "dsir":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.sampling import (
                dsir_fit,
                dsir_resample,
                dsir_score_col,
            )

            raw = spark.read.parquet(args.input)
            target = spark.read.parquet(args.target)
            w = dsir_fit(target, raw, args.text_col,
                         n_buckets=args.buckets)
            out_dir = os.path.join(args.output, "data")
            if args.scores_only:
                scored = raw.withColumn(
                    "dsir_logw",
                    dsir_score_col(F.col(args.text_col), w))
                scored.write.mode("overwrite").parquet(out_dir)
                agg = (spark.read.parquet(out_dir)
                       .agg(F.count("*").alias("n"),
                            F.round(F.avg(F.col("dsir_logw") / 1e6), 4)
                            .alias("mean_logw")).first())
                print(json.dumps({"rows": agg["n"],
                                  "mean_logw_nats": agg["mean_logw"],
                                  "buckets": args.buckets,
                                  "selected": None}))
                return 0
            sel = dsir_resample(raw, args.text_col, args.id_col, w,
                                n=args.n_select, seed=args.seed)
            sel.write.mode("overwrite").parquet(out_dir)
            n_out = spark.read.parquet(out_dir).count()
            print(json.dumps({"rows": n_out, "requested": args.n_select,
                              "buckets": args.buckets,
                              "seed": args.seed}))
            return 0

        if args.cmd == "metascrub":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.imgmeta import (
                image_metadata_audit,
                strip_image_metadata,
            )

            df = spark.read.parquet(args.input)
            audited = image_metadata_audit(df, args.bytes_col,
                                           args.fmt_col)
            out_dir = os.path.join(args.output, "data")
            if args.audit_only:
                audited.write.mode("overwrite").parquet(out_dir)
                src = spark.read.parquet(out_dir)
            else:
                stripped = strip_image_metadata(
                    audited.drop("meta_chunks", "other_ancillary",
                                 "text_keys", "has_text_meta", "has_exif",
                                 "has_time", "has_trailing")
                    .withColumnRenamed("meta_bytes", "meta_bytes_removed"),
                    args.bytes_col, args.fmt_col)
                stripped.write.mode("overwrite").parquet(out_dir)
                src = (spark.read.parquet(out_dir)
                       .withColumnRenamed("meta_bytes_removed",
                                          "meta_bytes"))
            agg = src.agg(
                F.count("*").alias("n"),
                F.sum((F.col("meta_bytes") > 0).cast("int")).alias("dirty"),
                F.sum("meta_bytes").alias("meta_bytes"),
                F.sum(F.col("meta_bytes").isNull().cast("int"))
                .alias("unauditable")).first()
            print(json.dumps({
                "rows": agg["n"],
                "rows_with_metadata": int(agg["dirty"] or 0),
                "metadata_bytes": int(agg["meta_bytes"] or 0),
                "unauditable_rows": int(agg["unauditable"] or 0),
                "stripped": not args.audit_only}))
            return 0

        if args.cmd == "resize":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.multimodal import (
                resize_images,
            )

            df = spark.read.parquet(args.input)
            # non-payload columns (caption, phash, ...) ride THROUGH
            # the Arrow stage, and --rehash hashes the output pixels
            # inside the same stage — no id-join, so the resized
            # payload never shuffles and is decoded exactly once
            passthrough = tuple(
                c for c in df.columns
                if c not in ("image_id", "bytes", "w", "h", "fmt"))
            if args.crop:
                from mehc_curation_spark.operators.multimodal import (
                    crop_borders,
                )

                # crop first, then cap resolution; the crop's own
                # decode_ok is re-derived by the resize stage
                df = crop_borders(df, tol=args.crop_tol,
                                  passthrough_cols=passthrough) \
                    .drop("decode_ok")
                passthrough = passthrough + ("cropped", "crop_top",
                                             "crop_bottom", "crop_left",
                                             "crop_right")
            out = resize_images(
                df, target=args.target, mode=args.mode,
                upscale=args.upscale, out_fmt=args.out_fmt,
                validate=not args.no_validate,
                passthrough_cols=passthrough,
                with_phash=args.rehash,
                hash_invariance=args.invariance)
            if args.rehash:
                old = (F.col("phash") if "phash" in passthrough
                       else F.lit(None).cast("long"))
                out = (out.withColumn(
                    "phash", F.coalesce("phash_computed", old))
                    .drop("phash_computed"))
            out.write.mode("overwrite").parquet(
                os.path.join(args.output, "data"))
            agg = (spark.read.parquet(os.path.join(args.output, "data"))
                   .agg(F.count("*").alias("n"),
                        F.sum(F.col("resized").cast("int")).alias("resized"),
                        F.sum((~F.col("decode_ok")).cast("int"))
                        .alias("undecodable"))
                   .first())
            print(json.dumps({
                "rows": agg["n"], "resized": int(agg["resized"] or 0),
                "undecodable": int(agg["undecodable"] or 0),
                "target": args.target, "mode": args.mode,
                "rehash": bool(args.rehash),
                "invariance": args.invariance}))
            return 0

        if args.cmd == "export":
            from mehc_curation_spark.io.export import (
                export_shards,
                export_webdataset,
                verify_export,
            )

            if args.verify:
                v = verify_export(spark, args.output)
                print(json.dumps(v))
                return 0 if v["ok"] else 3
            if args.n_shards is None and args.target_bytes is None                     and not args.resume:
                print("error: pass --n_shards or --target_bytes "
                      "(or --resume)", file=sys.stderr)
                return 2
            df_in = spark.read.parquet(args.input)
            if args.shard_format == "wds":
                m = export_webdataset(
                    df_in, args.output, id_col=args.id_col,
                    bytes_col=args.bytes_col, n_shards=args.n_shards,
                    target_bytes=args.target_bytes, seed=args.seed,
                    resume=args.resume)
            else:
                m = export_shards(
                    df_in, args.output,
                    id_col=args.id_col, n_shards=args.n_shards,
                    target_bytes=args.target_bytes, bytes_col=args.bytes_col,
                    seed=args.seed)
            print(json.dumps({k: m[k] for k in
                              ("n_shards", "rows", "payload_bytes", "seed")}
                             | {"format": m["format"]}))
            return 0

        if args.cmd == "tileindex":
            from mehc_curation_spark.operators.multimodal import (
                write_tile_index,
            )

            ref = spark.read.parquet(args.input)
            res = write_tile_index(
                ref, args.output, grid=args.grid, id_col=args.id_col,
                mode="append" if args.append else "overwrite")
            from mehc_curation_spark.io.catalog import SnapshotTable

            idx = SnapshotTable(args.output).read(spark)
            res["n_tiles"] = idx.count()
            res["n_images"] = idx.select("ref_id").distinct().count()
            print(json.dumps(res))
            return 0

        if args.cmd == "skew":
            df = spark.read.parquet(args.input)
            if args.join:
                from mehc_curation_spark.operators.profile import (
                    join_fanout_report,
                )

                rep = join_fanout_report(
                    df, spark.read.parquet(args.join), args.key,
                    right_key=args.right_key, top_k=args.top_k)
            else:
                from mehc_curation_spark.operators.profile import (
                    key_skew_report,
                )

                rep = key_skew_report(
                    df, args.key, top_k=args.top_k,
                    sample_fraction=args.sample_fraction,
                    id_col=args.id_col)
            for row in rep.collect():
                print(json.dumps(row.asDict()))
            return 0

        if args.cmd == "textindex":
            from mehc_curation_spark.operators.similarity import (
                write_text_index,
            )

            ref = spark.read.parquet(args.input)
            res = write_text_index(
                ref, args.output, args.id_col, args.text_col,
                num_hashes=args.num_hashes, bands=args.bands,
                shingle_k=args.shingle_k,
                mode="append" if args.append else "overwrite")
            from mehc_curation_spark.io.catalog import SnapshotTable

            res["n_docs"] = SnapshotTable(args.output).read(spark).count()
            print(json.dumps(res))
            return 0

        if args.cmd == "crossdedup":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.similarity import (
                cross_corpus_near_dups,
                cross_corpus_text_near_dups,
            )

            if args.reference_is_index and args.mode not in ("image",
                                                             "text"):
                raise SystemExit(
                    "--reference_is_index applies to --mode image/text")
            id_col = args.id_col or (
                "image_id" if args.mode == "image" else "doc_id")
            cand = spark.read.parquet(args.input) \
                .withColumnRenamed(id_col, "cand_id")
            if args.reference_is_index:
                ref = None
            else:
                ref = spark.read.parquet(args.reference) \
                    .withColumnRenamed(id_col, "ref_id")
            bad = ([] if "cand_id" in cand.columns else ["the input"]) \
                + ([] if ref is None or "ref_id" in ref.columns
                   else ["the reference"])
            if bad:
                raise SystemExit(
                    f"id column {id_col!r} not found in "
                    f"{' or '.join(bad)} (pass --id_col; image mode "
                    f"defaults to image_id, other modes to doc_id)")
            if args.mode == "exact":
                from mehc_curation_spark.operators.bloom import (
                    bloom_prefilter,
                )

                thr = 1.0
                # Bloom prefilter keeps the candidate corpus narrow;
                # only the tiny surviving fraction pays the verify
                # join that removes Bloom false positives.
                survivors = bloom_prefilter(
                    cand.select("cand_id", args.text_col),
                    ref.select("ref_id", args.text_col),
                    key_col=args.text_col)
                matches = (survivors
                           .join(ref.select("ref_id", args.text_col),
                                 args.text_col)
                           .select("cand_id", "ref_id",
                                   F.lit(1.0).alias("jaccard")))
            elif args.mode == "text":
                thr = 0.5 if args.threshold is None else args.threshold
                if args.reference_is_index:
                    from mehc_curation_spark.operators.similarity import (
                        read_text_index,
                        text_dups_against_index,
                    )

                    index, cfg = read_text_index(spark, args.reference)
                    matches = text_dups_against_index(
                        cand, index, "cand_id", args.text_col,
                        threshold=thr, **cfg)
                else:
                    matches = cross_corpus_text_near_dups(
                        cand, ref, "cand_id", "ref_id", args.text_col,
                        threshold=thr)
            elif args.mode == "image":
                from mehc_curation_spark.operators.multimodal import (
                    cross_corpus_tile_dups,
                    read_tile_index,
                    tile_dups_against_index,
                )

                if args.reference_is_index:
                    index, grid = read_tile_index(spark, args.reference)
                    thr = float(_tile_count(args.threshold, grid=grid))
                    matches = tile_dups_against_index(
                        cand, index, "cand_id", grid=grid,
                        min_match=int(thr))
                else:
                    # threshold = matching-tile count (of grid^2 = 16)
                    thr = float(_tile_count(args.threshold))
                    matches = cross_corpus_tile_dups(
                        cand, ref, "cand_id", "ref_id",
                        min_match=int(thr))
            else:
                thr = 0.85 if args.threshold is None else args.threshold
                matches = cross_corpus_near_dups(
                    cand, ref, args.vec_col, "cand_id", "ref_id",
                    threshold=thr)
            matches.write.mode("overwrite").parquet(
                os.path.join(args.output, "matches"))
            matches = spark.read.parquet(
                os.path.join(args.output, "matches"))
            n_cand = cand.count()
            flagged_ids = matches.select("cand_id").distinct()
            n_flagged = flagged_ids.count()
            if args.drop:
                (cand.join(flagged_ids, "cand_id", "left_anti")
                 .withColumnRenamed("cand_id", id_col)
                 .write.mode("overwrite")
                 .parquet(os.path.join(args.output, "data")))
            print(json.dumps({"mode": args.mode, "threshold": thr,
                              "candidates": n_cand,
                              "flagged": n_flagged,
                              "kept": n_cand - n_flagged}))
            return 0

        if args.cmd == "clusters":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.graph import near_dup_clusters
            from mehc_curation_spark.operators.similarity import (
                embedding_near_dups_lsh,
                minhash_near_dups,
                phash_near_dups,
            )

            df = spark.read.parquet(args.input)
            if args.mode == "text":
                id_col = args.id_col or "doc_id"
                thr = 0.5 if args.threshold is None else args.threshold
                pairs = minhash_near_dups(df, id_col, args.text_col,
                                          threshold=thr)
            elif args.mode == "phash":
                id_col = args.id_col or "image_id"
                thr = args.max_hamming
                pairs = phash_near_dups(df, "phash", id_col,
                                        max_hamming=args.max_hamming)
            elif args.mode == "tiles":
                from mehc_curation_spark.operators.multimodal import (
                    tile_near_dups,
                )

                id_col = args.id_col or "image_id"
                # threshold = matching-tile count (of grid^2 = 16)
                thr = float(_tile_count(args.threshold))
                pairs = tile_near_dups(df, grid=4, min_match=int(thr),
                                       id_col=id_col)
            else:
                id_col = args.id_col or (
                    "vec_id" if "vec_id" in df.columns else "doc_id")
                thr = 0.9 if args.threshold is None else args.threshold
                pairs = embedding_near_dups_lsh(df, args.vec_col, id_col,
                                                threshold=thr)
            out = near_dup_clusters(df, pairs.select("id_a", "id_b"),
                                    id_col, quality_col=args.quality_col)
            out.write.mode("overwrite").parquet(
                os.path.join(args.output, "clusters"))
            out = spark.read.parquet(os.path.join(args.output, "clusters"))
            n_rows = out.count()
            n_clusters = out.select("cluster").distinct().count()
            if args.keep_reps:
                reps = out.filter(F.col("is_rep")).select(id_col)
                (df.join(reps, id_col, "left_semi")
                 .write.mode("overwrite")
                 .parquet(os.path.join(args.output, "data")))
            print(json.dumps({"mode": args.mode, "threshold": thr,
                              "rows": n_rows, "clusters": n_clusters,
                              "dropped_non_reps": n_rows - n_clusters}))
            return 0

        if args.cmd == "card":
            from mehc_curation_spark.io.card import dataset_card, render_card

            df = spark.read.parquet(args.input)
            lang_col = args.lang_col or None
            if lang_col and lang_col not in df.columns:
                lang_col = None
            card = dataset_card(df, args.id_col, args.text_col,
                                lang_col=lang_col,
                                exact_distinct=args.exact)
            os.makedirs(args.output, exist_ok=True)
            with open(os.path.join(args.output, "card.json"), "w") as f:
                json.dump(card, f, indent=2, sort_keys=True)
            with open(os.path.join(args.output, "card.txt"), "w") as f:
                f.write(render_card(card) + "\n")
            print(json.dumps(card))
            return 0

        if args.cmd == "chunk":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.chunking import (
                chunk_documents,
                pack_chunks,
            )

            df = spark.read.parquet(args.input)
            chunks = chunk_documents(df, args.id_col, args.text_col,
                                     chunk_tokens=args.chunk_tokens,
                                     overlap=args.overlap)
            data_dir = os.path.join(args.output, "data")
            summary = {"chunk_tokens": args.chunk_tokens,
                       "overlap": args.overlap, "packed": bool(args.pack)}
            if args.pack:
                packed = pack_chunks(
                    chunks.withColumn(
                        "_uid", F.concat_ws(":", args.id_col, "chunk_id")),
                    "_uid", "n_tok", seq_tokens=args.seq_tokens,
                    shard_bits=args.shard_bits).drop("_uid")
                packed.write.mode("overwrite") \
                      .partitionBy("shard").parquet(data_dir)
                out = spark.read.parquet(data_dir)
                agg = (out.groupBy("shard", "seq_id")
                       .agg(F.sum("n_tok").alias("t"))
                       .agg(F.count("*").alias("nseq"),
                            F.sum("t").alias("tok")).first())
                summary.update({
                    "chunks": out.count(),
                    "tokens": int(agg["tok"] or 0),
                    "sequences": int(agg["nseq"] or 0),
                    "seq_tokens": args.seq_tokens,
                    "fill_rate": round(
                        (agg["tok"] or 0) /
                        (args.seq_tokens * agg["nseq"]), 4)
                    if agg["nseq"] else 0.0})
            else:
                chunks.write.mode("overwrite").parquet(data_dir)
                out = spark.read.parquet(data_dir)
                agg = out.agg(F.count("*").alias("n"),
                              F.sum("n_tok").alias("tok")).first()
                summary.update({"chunks": int(agg["n"]),
                                "tokens": int(agg["tok"] or 0)})
            print(json.dumps(summary))
            return 0

        if args.cmd == "semdedup":
            from pyspark.sql import functions as F

            from mehc_curation_spark.operators.similarity import semdedup

            df = spark.read.parquet(args.input)
            id_col = args.id_col or (
                "vec_id" if "vec_id" in df.columns else "doc_id")
            labels = semdedup(df, args.vec_col, id_col,
                              threshold=args.threshold,
                              n_cells=args.n_cells, seed=args.seed)
            labels.write.mode("overwrite").parquet(
                os.path.join(args.output, "labels"))
            labels = spark.read.parquet(os.path.join(args.output, "labels"))
            n_rows = labels.count()
            n_kept = labels.filter(F.col("keep")).count()
            if args.drop:
                keep_ids = labels.filter(F.col("keep")).select(id_col)
                (df.join(keep_ids, id_col, "left_semi")
                 .write.mode("overwrite")
                 .parquet(os.path.join(args.output, "data")))
            print(json.dumps({"threshold": args.threshold,
                              "n_cells": args.n_cells, "rows": n_rows,
                              "kept": n_kept,
                              "dropped": n_rows - n_kept}))
            return 0

        if args.cmd == "curate":
            from mehc_curation_spark.io.ledger import Ledger
            from mehc_curation_spark.io.reports import render_report
            from mehc_curation_spark.rules.registry import CurationConfig
            from mehc_curation_spark.stages.refinement import run_curate

            cfg = CurationConfig(
                validate=args.validate,
                rm_low_quality_image=args.rm_low_quality_image,
                rm_low_quality=args.rm_low_quality,
                rm_unknown_lang=args.rm_unknown_lang,
                rm_high_ppl=args.rm_high_ppl,
                scrub_pii=args.scrub_pii,
                scrub_toxicity=args.scrub_toxicity,
                toxicity_method=args.toxicity_method,
                validate_post_scrub=args.validate_post_scrub,
                normalize_lossy=args.normalize_lossy,
                normalize_canonical=args.normalize_canonical,
                rm_dup_between_stages=args.rm_dup_between_stages,
                phash_buckets=args.phash_buckets,
                dedup_strategy=args.dedup_strategy,
            )
            if args.incremental:
                from mehc_curation_spark.stages.incremental import (
                    run_curate_increment,
                )

                metrics = run_curate_increment(
                    spark, args.input, args.output, cfg,
                    flip_mode=args.flip_mode,
                    settle_deletes_after=args.settle_deletes_after)
            else:
                metrics = run_curate(spark, args.input, args.output, cfg,
                                     resume=args.resume,
                                     input_format=args.input_format)
            if metrics.get("resumed_noop"):
                sys.stderr.write(
                    "nothing to do: all "
                    f"{len(metrics['buckets_done'])} buckets already "
                    "committed in the ledger; pass --no_resume to "
                    "recompute from scratch\n")
            print(json.dumps(metrics))
            if args.get_output:
                from pyspark.sql import functions as F

                labels = spark.read.parquet(
                    os.path.join(args.output, "data"))
                (labels.filter(~F.col("keep"))
                 .write.mode("overwrite").partitionBy("drop_reason")
                 .parquet(os.path.join(args.output, "rejected")))
            if args.get_report:
                led = Ledger(args.output).read()
                reasons: dict[str, int] = {}
                total = 0
                for e in led["buckets"].values():
                    total += e["rows"]
                    for k, v in e["dropped"].items():
                        reasons[k] = reasons.get(k, 0) + v
                report = render_report(reasons, total, cfg)
                rpath = os.path.join(args.output, "report.txt")
                with open(rpath, "w") as f:
                    f.write(report)
                print(report)
            return 0

        df = spark.read.parquet(args.input)
        if args.cmd == "validate":
            from mehc_curation_spark.stages.validation import ValidationStage

            out, fmt = ValidationStage(df).complete_validation(True)
        elif args.cmd == "clean":
            from mehc_curation_spark.stages.cleaning import CleaningStage

            out, fmt = CleaningStage(df).complete_cleaning(
                args.toxicity_method, True)
        elif args.cmd == "normalize":
            from mehc_curation_spark.stages.normalization import NormalizationStage

            out, fmt = NormalizationStage(df).complete_normalization(True)
        else:  # dedup
            from mehc_curation_spark.operators.dedup import deduplicate

            out, dups_info, fmt, rejected = deduplicate(
                df, show_dup_info=True, return_format_data=True,
                return_rejected=True)
            dups_info.write.mode("overwrite").parquet(
                os.path.join(args.output, "dups_info"))
        out.write.mode("overwrite").parquet(os.path.join(args.output, "data"))
        if args.get_output and args.cmd != "normalize":
            # per-reason rejected-row dumps (normalization rewrites
            # captions but rejects nothing, so it has no dump).
            from pyspark.sql import functions as F

            if args.cmd == "dedup":
                # `rejected` comes from deduplicate() itself (same
                # all-column conflict semantics as data/), so the
                # export always reconciles with what was dropped.
                rej = rejected.drop("bytes") if "bytes" in rejected.columns \
                    else rejected
                part_col = "dup_reason"
            else:
                # the fused labels plan with only this stage's gates on
                # yields exactly this stage's per-rule drop reasons.
                from mehc_curation_spark.rules.registry import CurationConfig
                from mehc_curation_spark.stages.plan import build_labels_plan

                if args.cmd == "validate":
                    cfg = CurationConfig(
                        scrub_pii=False, scrub_toxicity=False,
                        validate_post_scrub=False, normalize_lossy=False,
                        normalize_canonical=False,
                        rm_dup_between_stages=False)
                else:  # clean
                    cfg = CurationConfig(
                        validate=False, rm_low_quality=False,
                        rm_unknown_lang=False, rm_high_ppl=False,
                        toxicity_method=args.toxicity_method,
                        validate_post_scrub=False, normalize_lossy=False,
                        normalize_canonical=False,
                        rm_dup_between_stages=False)
                rej = build_labels_plan(df, cfg).filter(~F.col("keep"))
                part_col = "drop_reason"
            (rej.write.mode("overwrite").partitionBy(part_col)
             .parquet(os.path.join(args.output, "rejected")))
        if args.get_report and args.cmd != "dedup":
            from mehc_curation_spark.io.reports import (
                render_cleaning_report,
                render_normalization_report,
                render_validation_report,
            )

            render = {"validate": render_validation_report,
                      "clean": render_cleaning_report,
                      "normalize": render_normalization_report}[args.cmd]
            report = render(fmt)
            with open(os.path.join(args.output, "report.txt"), "w") as f:
                f.write(report)
            print(report)
        print(json.dumps(fmt))
        return 0
    except Exception as exc:
        # commit conflicts (concurrent writer, pending MoR delete debt)
        # are operator guidance, not bugs — one friendly line, exit 1
        from mehc_curation_spark.io.catalog import CommitConflictError

        if isinstance(exc, CommitConflictError):
            sys.stderr.write(f"error: {exc}\n")
            return 1
        raise
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
