"""Model-based randomized check of the catalog's sequence-scoped
merge-on-read semantics: a pure-Python reference model (rows carry the
sequence of the commit that added them; an equality delete at seq s
masks rows with seq < s whose key it names) is driven through random
interleavings of append / re-ingest / MoR delete / MoR merge /
MoR update / apply_deletes / compact, and the table's visible row set
must equal the model after every op.

Seeded random (not hypothesis): each op is a Spark job, so shrinking
is impractical — failures print the full op log for replay instead.
"""

import random

import pytest

from mehc_curation_spark.io.catalog import SnapshotTable


class Model:
    """Reference semantics. rows: list of dicts with id/caption/phash/
    seq; deletes: list of (frozenset(keys), seq)."""

    def __init__(self):
        self.rows = []
        self.deletes = []
        self.seq = 0

    def _next(self):
        self.seq += 1
        return self.seq

    def visible(self):
        out = []
        for r in self.rows:
            if any(r["id"] in ks and r["seq"] < s
                   for ks, s in self.deletes):
                continue
            out.append((r["id"], r["caption"], r["phash"]))
        return sorted(out)

    def append(self, rows):
        s = self._next()
        for (i, c, p) in rows:
            self.rows.append({"id": i, "caption": c, "phash": p,
                              "seq": s})

    def delete_keys(self, keys):
        if keys:
            self.deletes.append((frozenset(keys), self._next()))

    def merge(self, rows):
        s = self._next()
        self.deletes.append((frozenset(i for i, _c, _p in rows), s))
        for (i, c, p) in rows:
            self.rows.append({"id": i, "caption": c, "phash": p,
                              "seq": s})

    def update(self, phash_mod, new_caption):
        matched_ids = {i for (i, c, p) in self.visible()
                       if p % 7 == phash_mod}
        if not matched_ids:
            return
        group = [(i, c, p) for (i, c, p) in self.visible()
                 if i in matched_ids]
        s = self._next()
        self.deletes.append((frozenset(matched_ids), s))
        for (i, c, p) in group:
            self.rows.append({
                "id": i,
                "caption": new_caption if p % 7 == phash_mod else c,
                "phash": p, "seq": s})

    def settle(self):
        keep = []
        for r in self.rows:
            if any(r["id"] in ks and r["seq"] < s
                   for ks, s in self.deletes):
                continue
            keep.append(r)
        self.rows = keep
        self.deletes = []


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, caption string, phash bigint")


def _visible(spark, t):
    return sorted((r["image_id"], r["caption"], r["phash"])
                  for r in t.read(spark).collect())


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_random_mor_interleavings_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = SnapshotTable(str(tmp_path / f"m{seed}"))
    model = Model()
    next_id = [0]
    log = []

    def fresh(n):
        out = [(f"id{next_id[0] + k:04d}",
                f"cap{rng.randrange(1000)}",
                rng.randrange(100)) for k in range(n)]
        next_id[0] += n
        return out

    def existing_ids(k):
        vis = model.visible()
        if not vis:
            return []
        return [i for (i, _c, _p) in rng.sample(vis, min(k, len(vis)))]

    # bootstrap
    rows = fresh(8)
    log.append(("append", rows))
    t.write(_df(spark, rows), stats_cols=("image_id",))
    model.append(rows)

    for step in range(12):
        op = rng.choice(["append", "reingest", "delete", "merge",
                         "update", "settle", "compact"])
        try:
            if op == "append":
                rows = fresh(rng.randrange(1, 4))
                log.append(("append", rows))
                t.write(_df(spark, rows))
                model.append(rows)
            elif op == "reingest":
                ids = existing_ids(2)
                if not ids:
                    continue
                rows = [(i, f"re{step}_{rng.randrange(100)}",
                         rng.randrange(100)) for i in ids]
                log.append(("reingest", rows))
                t.write(_df(spark, rows))
                model.append(rows)
            elif op == "delete":
                ids = existing_ids(rng.randrange(1, 3))
                if not ids:
                    continue
                log.append(("delete", ids))
                in_list = ", ".join(f"'{i}'" for i in ids)
                t.delete_where(spark, f"image_id in ({in_list})",
                               mode="mor")
                model.delete_keys(ids)
            elif op == "merge":
                ids = existing_ids(1)
                rows = ([(ids[0], f"mg{step}", rng.randrange(100))]
                        if ids else []) + fresh(1)
                log.append(("merge", rows))
                t.merge_upsert(spark, _df(spark, rows), "image_id",
                               mode="mor")
                model.merge(rows)
            elif op == "update":
                mod = rng.randrange(7)
                cap = f"upd{step}"
                log.append(("update", mod, cap))
                t.update_where(spark, f"phash % 7 = {mod}",
                               {"caption": f"'{cap}'"}, mode="mor")
                model.update(mod, cap)
            elif op == "settle":
                log.append(("settle",))
                t.apply_deletes(spark)
                model.settle()
            else:
                log.append(("compact",))
                t.compact(spark, target_files=2)
                model.settle()  # compact settles pending debt too
            got = _visible(spark, t)
            want = model.visible()
            assert got == want, (
                f"divergence after step {step} {op}; op log: {log}\n"
                f"only-table: {sorted(set(got) - set(want))[:5]}\n"
                f"only-model: {sorted(set(want) - set(got))[:5]}")
        except AssertionError:
            raise
    # end state settles clean
    t.apply_deletes(spark)
    model.settle()
    assert _visible(spark, t) == model.visible(), f"final; log: {log}"
    assert not t.manifest().get("deletes")


@pytest.mark.parametrize("seed", [11, 47])
def test_random_wap_segment_mor_interleavings_match_model(
        spark, tmp_path, seed, monkeypatch):
    """r5 widening (VERDICT r4 Next #5): the same model check with
    (a) manifest SEGMENTS engaged from the start (threshold lowered
    to 4 files so every commit exercises _pack_segments alongside MoR
    debt), and (b) branch/WAP ops interleaved — stage rows on a
    branch, publish via rebase_publish, and when a takedown landed on
    main while staged, observe the REFUSAL contract and resolve it
    the documented way (settle, then publish)."""
    monkeypatch.setattr(SnapshotTable, "SEGMENT_MIN_FILES", 4)
    from mehc_curation_spark.io.catalog import CommitConflictError

    rng = random.Random(seed)
    t = SnapshotTable(str(tmp_path / f"w{seed}"))
    model = Model()
    next_id = [0]
    log = []
    staged = []          # rows staged on the active branch, else []
    branch_open = [False]

    def fresh(n):
        out = [(f"id{next_id[0] + k:04d}",
                f"cap{rng.randrange(1000)}",
                rng.randrange(100)) for k in range(n)]
        next_id[0] += n
        return out

    def existing_ids(k):
        vis = model.visible()
        if not vis:
            return []
        return [i for (i, _c, _p) in rng.sample(vis, min(k, len(vis)))]

    rows = fresh(8)
    log.append(("append", rows))
    t.write(_df(spark, rows), stats_cols=("image_id",))
    model.append(rows)

    for step in range(14):
        op = rng.choice(["append", "reingest", "delete", "merge",
                         "settle", "compact", "branch", "publish"])
        if op == "append":
            rows = fresh(rng.randrange(1, 4))
            log.append(("append", rows))
            t.write(_df(spark, rows))
            model.append(rows)
        elif op == "reingest":
            ids = existing_ids(2)
            if not ids:
                continue
            rows = [(i, f"re{step}_{rng.randrange(100)}",
                     rng.randrange(100)) for i in ids]
            log.append(("reingest", rows))
            t.write(_df(spark, rows))
            model.append(rows)
        elif op == "delete":
            ids = existing_ids(rng.randrange(1, 3))
            if not ids:
                continue
            log.append(("delete", ids))
            in_list = ", ".join(f"'{i}'" for i in ids)
            t.delete_where(spark, f"image_id in ({in_list})",
                           mode="mor")
            model.delete_keys(ids)
        elif op == "merge":
            ids = existing_ids(1)
            rows = ([(ids[0], f"mg{step}", rng.randrange(100))]
                    if ids else []) + fresh(1)
            log.append(("merge", rows))
            t.merge_upsert(spark, _df(spark, rows), "image_id",
                           mode="mor")
            model.merge(rows)
        elif op == "settle":
            log.append(("settle",))
            t.apply_deletes(spark)
            model.settle()
        elif op == "compact":
            log.append(("compact",))
            t.compact(spark, target_files=2)
            model.settle()
        elif op == "branch":
            if branch_open[0]:
                continue
            staged[:] = fresh(rng.randrange(1, 3))
            log.append(("branch", list(staged)))
            t.create_branch("audit")
            t.write(_df(spark, staged), branch="audit")
            branch_open[0] = True
            # main's visible set must be unaffected by staging
        else:  # publish
            if not branch_open[0]:
                continue
            log.append(("publish",))
            try:
                t.rebase_publish("audit")
            except CommitConflictError:
                # documented resolution of the takedown race: the
                # target gained equality deletes since the base —
                # settle them, then the publish must land
                log.append(("publish-settle-retry",))
                t.apply_deletes(spark)
                model.settle()
                t.rebase_publish("audit")
            t.drop_branch("audit")
            model.append(staged)
            staged[:] = []
            branch_open[0] = False
        got = _visible(spark, t)
        want = model.visible()
        assert got == want, (
            f"divergence after step {step} {op}; op log: {log}\n"
            f"only-table: {sorted(set(got) - set(want))[:5]}\n"
            f"only-model: {sorted(set(want) - set(got))[:5]}")
        # segments actually engaged (the point of the low threshold)
        if len(t.manifest()["files"]) >= 4:
            assert t.manifest().get("segments") or step < 2

    if branch_open[0]:
        t.drop_branch("audit")
    t.apply_deletes(spark)
    model.settle()
    assert _visible(spark, t) == model.visible(), f"final; log: {log}"
    assert not t.manifest().get("deletes")
