"""Model-based randomized walk over the metadata-only DDL family
(rename / drop / widen / append-with-evolution): a driver-side model
tracks every row's expected values under the CURRENT schema and the
schema AS OF each snapshot; after every step the table must read
back exactly the model — current reads, as-of-schema time travel to
every prior snapshot, and the retired-name guard.

This is the schema-evolution sibling of test_manifest_model.py's
file-list walk: the rename journal, schema log, vintage coalescing,
and overlay interactions have enough composition surface (chains,
drops of renamed columns' successors, widens of renamed columns,
appends in mixed vintages) that targeted tests can't enumerate it.

r12: the walk also threads MERGE-ON-READ tails through the DDL —
position deletes, equality-delete merges keyed on id, and an
eq-delete merge keyed on a WIDENABLE column that must permanently
lock rename/drop/widen of that column (the r12
widen-resurrection guard, reproduced live before fixing: with the
guard reverted the walk's DID-NOT-RAISE assertion fires — seed 2
of the five catches it). The
model applies every tail to its row map, so current reads AND as-of
reads verify tails composing with renames/drops/widens."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
    LakehouseTable,
)

_TYPES = ["int", "bigint", "double", "string"]
# READ-safe promotions only (operators/schema_evolution.py): the
# walk also asserts the guard fires on a non-read-safe pair below
_WIDEN = {"int": ["bigint", "double"]}


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_schema_evolution_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = LakehouseTable(str(tmp_path / f"t{seed}"))

    # model state
    cols: dict[str, str] = {"id": "bigint", "c0": "int"}  # name->type
    order = ["id", "c0"]
    retired: set[str] = set()
    # columns a LIVE equality-delete file keys on: rename/drop/widen
    # must refuse them forever (the walk never expires history)
    eq_locked: set[str] = set()
    rows: dict[int, dict] = {}  # id -> {current col name: value}
    next_row = 0
    next_col = 1
    # per-snapshot history for as-of checks: (snap_id, [col order],
    # {col: type}, rename-map-at-time {current: oldest-name-chain})
    history: list[tuple] = []

    def _sql_schema():
        return ", ".join(f"{c} {cols[c]}" for c in order)

    def _val(col, typ, rid):
        if typ == "string":
            return f"{col}-{rid}"
        if typ == "double":
            return float(rid * 2)
        return rid + 1

    def op_append():
        nonlocal next_row
        n = rng.randint(1, 3)
        data = []
        for _ in range(n):
            rid = next_row
            next_row += 1
            row = {"id": rid}
            for c in order:
                if c != "id":
                    row[c] = _val(c, cols[c], rid)
            rows[rid] = dict(row)
            data.append(tuple(row[c] for c in order))
        t.append(spark.createDataFrame(data, _sql_schema()))

    def op_add_column():
        nonlocal next_col
        name = f"c{next_col}"
        next_col += 1
        if name in retired:
            return
        typ = rng.choice(_TYPES)
        cols[name] = typ
        order.append(name)
        # added columns surface NULL for pre-add rows
        for rid in rows:
            rows[rid][name] = None
        op_append()  # the add lands via append-evolution

    def op_rename():
        cands = [c for c in order if c != "id" and c not in eq_locked]
        if not cands:
            return
        old = rng.choice(cands)
        name = f"r{next_col}_{old}"
        if name in retired or name in cols:
            return
        t.rename_column(old, name)
        cols[name] = cols.pop(old)
        order[order.index(old)] = name
        retired.add(old)
        for rid in rows:
            rows[rid][name] = rows[rid].pop(old)

    def op_drop():
        cands = [
            c for c in order if c != "id" and c not in eq_locked
        ]
        if len(cands) < 2:
            return
        victim = rng.choice(cands)
        t.drop_column(victim)
        del cols[victim]
        order.remove(victim)
        retired.add(victim)
        for rid in rows:
            rows[rid].pop(victim, None)

    def op_widen():
        cands = [
            c
            for c in order
            if cols[c] in _WIDEN and c not in eq_locked
        ]
        if not cands:
            return
        c = rng.choice(cands)
        to = rng.choice(_WIDEN[cols[c]])
        t.widen_column(c, to)
        old_t = cols[c]
        cols[c] = to
        # model values upcast like the scan does
        if to == "double":
            for rid in rows:
                v = rows[rid].get(c)
                if v is not None:
                    rows[rid][c] = float(v)
        _ = old_t

    def op_unreadable_widen_refused():
        cands = [
            c
            for c in order
            if cols[c] == "bigint"
            and c != "id"
            and c not in eq_locked
        ]
        if not cands:
            return
        with pytest.raises(ValueError, match="READ-safe"):
            t.widen_column(rng.choice(cands), "double")

    def op_retired_reuse_refused():
        if not retired:
            return
        name = rng.choice(sorted(retired))
        src = rng.choice([c for c in order if c != "id"] or ["id"])
        if src == "id":
            return
        with pytest.raises(ValueError):
            t.rename_column(src, name)

    def op_mor_delete():
        live = sorted(rows)
        if len(live) < 3:
            return
        k = rng.choice([3, 5, 7])
        m = rng.randrange(k)
        t.delete_where_mor(spark, F.col("id") % k == m)
        for rid in [r for r in rows if r % k == m]:
            del rows[rid]

    def op_mor_merge_on_id():
        nonlocal next_row
        live = sorted(rows)
        if not live:
            return
        upd = rng.sample(live, min(len(live), rng.randint(1, 2)))
        new_id = next_row
        next_row += 1
        data = []
        for rid in upd + [new_id]:
            row = {"id": rid}
            for c in order:
                if c != "id":
                    row[c] = _val(c, cols[c], rid + 5000)
            rows[rid] = dict(row)
            data.append(tuple(row[c] for c in order))
        t.merge(
            spark,
            spark.createDataFrame(data, _sql_schema()),
            keys=["id"],
            mode="merge-on-read",
        )
        eq_locked.add("id")

    def op_eq_merge_locks_widenable_column():
        """Equality-delete merge keyed on a WIDENABLE int column:
        from then on rename/drop/widen of that column must refuse
        (the r12 widen-resurrection guard) — asserted immediately
        and enforced on the model's candidate sets forever."""
        nonlocal next_row
        cands = [
            c
            for c in order
            if cols[c] == "int" and c not in eq_locked
        ]
        live = sorted(rows)
        if not cands or not live:
            return
        key = rng.choice(cands)
        # every model value of an int column is rid+1 and NON-NULL
        # only for rows appended while the column existed; restrict
        # the merge to keys of rows with a non-null value
        victims = [
            rid for rid in live if rows[rid].get(key) is not None
        ]
        if not victims:
            return
        rid = rng.choice(victims)
        new_id = next_row
        next_row += 1
        row = {"id": new_id}
        for c in order:
            if c != "id":
                row[c] = _val(c, cols[c], new_id)
        row[key] = rows[rid][key]  # same key value: voids rid
        t.merge(
            spark,
            spark.createDataFrame(
                [tuple(row[c] for c in order)], _sql_schema()
            ),
            keys=[key],
            mode="merge-on-read",
        )
        # the eq delete voids EVERY older row matching the key value
        kv = row[key]
        for r2 in [x for x in list(rows) if rows[x].get(key) == kv]:
            del rows[r2]
        rows[new_id] = dict(row)
        eq_locked.add(key)
        with pytest.raises(ValueError, match="equality-delete"):
            t.widen_column(key, "double")
        with pytest.raises(ValueError, match="equality-delete"):
            t.rename_column(key, f"locked_{key}")
        with pytest.raises(ValueError, match="equality-delete"):
            t.drop_column(key)

    def check():
        df = t.read(spark)
        assert df.columns == order
        got = {r["id"]: r.asDict() for r in df.collect()}
        assert set(got) == set(rows)
        for rid, want in rows.items():
            g = got[rid]
            for c in order:
                assert g[c] == want.get(c), (seed, rid, c, g[c], want)
        # spot-check ONE random historical snapshot with the as-of
        # schema: its column ORDER and NAMES must match what was
        # committed then (values checked for ids that existed then)
        if history:
            sid, h_order, h_rows = rng.choice(history)
            old = t.read(
                spark, snapshot_id=sid, use_snapshot_schema=True
            )
            assert old.columns == h_order, (seed, sid)
            g2 = {r["id"]: r.asDict() for r in old.collect()}
            assert set(g2) == set(h_rows)
            for rid, want in h_rows.items():
                for c in h_order:
                    assert g2[rid][c] == want.get(c), (
                        seed, sid, rid, c,
                    )

    ops = [
        (op_append, 5),
        (op_add_column, 2),
        (op_rename, 3),
        (op_drop, 1),
        (op_widen, 2),
        (op_retired_reuse_refused, 1),
        (op_unreadable_widen_refused, 1),
        (op_mor_delete, 2),
        (op_mor_merge_on_id, 2),
        (op_eq_merge_locks_widenable_column, 1),
    ]
    weighted = [f for f, w in ops for _ in range(w)]

    op_append()  # seed the table
    history.append(
        (
            t.current_snapshot_id(),
            list(order),
            {rid: dict(r) for rid, r in rows.items()},
        )
    )
    for _step in range(12):
        rng.choice(weighted)()
        check()
        history.append(
            (
                t.current_snapshot_id(),
                list(order),
                {rid: dict(r) for rid, r in rows.items()},
            )
        )
