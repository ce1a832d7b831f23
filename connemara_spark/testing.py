"""Test support: synthetic wal2json event generation + a sequential oracle.

FIXTURES.md F1 rules (mirroring wal2json v1 with include-types=false,
connemara_replication.c:504):

- insert: columnnames/columnvalues present, no oldkeys (replay.pl:934-937)
- update: both present; columnnames MAY omit unchanged TOAST-able columns
  (replay.pl:185-194); oldkeys holds the pre-image PK (replay.pl:911-912);
  PK-change cases included (replay.pl:905-931)
- delete: only oldkeys (replay.pl:897-904)
- all values are strings or null (types recovered from catalog)

``SequentialOracle`` applies the same events one at a time with plain Python
dicts — the reference's per-key serial semantics verbatim — so tests can
hash-compare the distributed fold against the sequential ground truth.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta
from typing import Any

from connemara_spark.catalog import TableSpec

EPOCH = datetime(2024, 1, 1)


def _s(v: Any) -> str | None:
    """Stringify a value the way wal2json-as-text would."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def make_event(
    spec: TableSpec,
    op: str,
    *,
    lsn: int,
    row: dict[str, Any] | None = None,
    old_key: dict[str, Any] | None = None,
    present: list[str] | None = None,
    ts: datetime | None = None,
    xid: int | None = None,
) -> dict[str, Any]:
    """One bronze spool row (BRONZE_SCHEMA dict) for the given change."""
    ts = ts or (EPOCH + timedelta(seconds=lsn))
    payload: dict[str, Any] = {"kind": op, "schema": spec.schema, "table": spec.table}
    if op in ("insert", "update"):
        assert row is not None
        names = present if present is not None else [c.name for c in spec.columns]
        payload["columnnames"] = names
        payload["columnvalues"] = [_s(row.get(n)) for n in names]
    if op in ("update", "delete"):
        key = old_key if old_key is not None else {k: row[k] for k in spec.pk_cols}  # type: ignore[index]
        payload["oldkeys"] = {
            "keynames": list(key.keys()),
            "keyvalues": [_s(v) for v in key.values()],
        }
    return {
        "insert_timestamp": ts,
        "database": spec.database,
        "source_slotname": f"slot_{spec.database}",
        "lsn_start": lsn,
        "xid": xid if xid is not None else 1000 + lsn,
        "xid_timestamp": ts,
        "payload": json.dumps(payload),
    }


def random_event_stream(
    spec: TableSpec,
    base_rows: list[dict[str, Any]],
    *,
    n_events: int = 200,
    seed: int = 42,
    start_lsn: int = 1,
    pk_change_prob: float = 0.05,
    partial_update_prob: float = 0.3,
    value_maker: dict[str, Any] | None = None,
) -> list[dict[str, Any]]:
    """Deterministic mixed insert/update/delete stream over a keyed table.

    Maintains a live-key model so updates/deletes target existing rows (the
    reference dies on 0-rows-affected, replay.pl:416-426). PK-change updates
    and partial-column updates included per FIXTURES.md F1.
    """
    rng = random.Random(seed)
    assert len(spec.pk_cols) >= 1
    live: dict[tuple, dict[str, Any]] = {}
    for r in base_rows:
        live[tuple(r[k] for k in spec.pk_cols)] = dict(r)
    next_key = max((k[0] for k in live), default=0)
    if not isinstance(next_key, int):
        next_key = 10_000_000
    next_key = int(next_key) + 1_000_000

    non_pk = [c.name for c in spec.columns if c.name not in spec.pk_cols]
    events = []

    def fresh_values(key_vals: tuple) -> dict[str, Any]:
        row = dict(zip(spec.pk_cols, key_vals))
        for c in spec.columns:
            if c.name in spec.pk_cols:
                continue
            if value_maker and c.name in value_maker:
                row[c.name] = value_maker[c.name](rng)
            else:
                t = c.pg_type
                if t in ("integer", "bigint", "smallint"):
                    row[c.name] = rng.randint(0, 10_000)
                elif t in ("double precision", "real", "numeric"):
                    row[c.name] = round(rng.uniform(-1000, 1000), 2)
                elif t.startswith("timestamp"):
                    row[c.name] = EPOCH + timedelta(seconds=rng.randint(0, 10_000_000))
                else:
                    row[c.name] = f"v{rng.randint(0, 99999)}"
        return row

    # O(1) random live-key selection: rng.choice(sorted(live)) was
    # O(n log n) PER EVENT, which made million-event streams over
    # 50k-row tables take tens of minutes to generate. A swap-remove
    # key list keeps selection/insert/delete O(1); still fully
    # deterministic for a given seed (the list order is a pure function
    # of the event sequence).
    keys_list = sorted(live)
    key_pos = {k: i for i, k in enumerate(keys_list)}

    def _add_key(k: tuple) -> None:
        key_pos[k] = len(keys_list)
        keys_list.append(k)

    def _del_key(k: tuple) -> None:
        i = key_pos.pop(k)
        last = keys_list.pop()
        if last != k:
            keys_list[i] = last
            key_pos[last] = i

    for i in range(n_events):
        lsn = start_lsn + i
        roll = rng.random()
        if not live or roll < 0.3:
            # insert a brand-new key (single-column int pk assumed for new keys)
            key = (next_key,) + tuple(0 for _ in spec.pk_cols[1:])
            next_key += 1
            row = fresh_values(key)
            live[key] = row
            _add_key(key)
            events.append(make_event(spec, "insert", lsn=lsn, row=row))
        elif roll < 0.75:
            key = keys_list[rng.randrange(len(keys_list))]
            old_row = live[key]
            if rng.random() < pk_change_prob:
                # PK-change update (replay.pl:905-931)
                new_key = (next_key,) + key[1:]
                next_key += 1
                row = dict(old_row)
                for k, v in zip(spec.pk_cols, new_key):
                    row[k] = v
                del live[key]
                _del_key(key)
                live[new_key] = row
                _add_key(new_key)
                events.append(
                    make_event(spec, "update", lsn=lsn, row=row, old_key=dict(zip(spec.pk_cols, key)))
                )
            else:
                row = dict(old_row)
                changed = rng.sample(non_pk, k=max(1, rng.randint(1, len(non_pk))))
                for c in changed:
                    row[c] = fresh_values(key)[c]
                live[key] = row
                if rng.random() < partial_update_prob:
                    # partial-column update: omit unchanged TOASTable cols
                    present = spec.pk_cols + changed
                    events.append(
                        make_event(
                            spec, "update", lsn=lsn, row=row,
                            old_key=dict(zip(spec.pk_cols, key)), present=present,
                        )
                    )
                else:
                    events.append(
                        make_event(spec, "update", lsn=lsn, row=row, old_key=dict(zip(spec.pk_cols, key)))
                    )
        else:
            key = keys_list[rng.randrange(len(keys_list))]
            del live[key]
            _del_key(key)
            events.append(make_event(spec, "delete", lsn=lsn, old_key=dict(zip(spec.pk_cols, key))))
    return events


class SequentialOracle:
    """Applies F1 events one at a time — the reference's serial semantics."""

    def __init__(self, spec: TableSpec, base_rows: list[dict[str, Any]]):
        self.spec = spec
        self.state: dict[tuple, dict[str, Any]] = {
            tuple(r[k] for k in spec.pk_cols): {c.name: r.get(c.name) for c in spec.columns}
            for r in base_rows
        }

    def apply(self, bronze_rows: list[dict[str, Any]]) -> None:
        ordered = sorted(bronze_rows, key=lambda r: (r["insert_timestamp"], r["lsn_start"]))
        for r in ordered:
            p = json.loads(r["payload"])
            if p.get("schema") != self.spec.schema or p.get("table") != self.spec.table:
                continue
            op = p["kind"]
            if op in ("update", "delete"):
                ok = p["oldkeys"]
                keymap = dict(zip(ok["keynames"], ok["keyvalues"]))
                old_key = tuple(self._typed(k, keymap[k]) for k in self.spec.pk_cols)
            if op in ("insert", "update"):
                names = p["columnnames"]
                vals = p["columnvalues"]
                rec = {n: v for n, v in zip(names, vals)}
            if op == "insert":
                new_key = tuple(self._typed(k, rec[k]) for k in self.spec.pk_cols)
                self.state[new_key] = {
                    c.name: self._typed(c.name, rec.get(c.name)) for c in self.spec.columns
                }
            elif op == "delete":
                self.state.pop(old_key, None)
            else:  # update: overlay present columns; handle pk change
                cur = self.state.pop(old_key, {c.name: None for c in self.spec.columns})
                for n, v in rec.items():
                    if n in {c.name for c in self.spec.columns}:
                        cur[n] = self._typed(n, v)
                new_key = tuple(cur[k] for k in self.spec.pk_cols)
                self.state[new_key] = cur

    def _typed(self, col: str, v: str | None) -> Any:
        if v is None:
            return None
        c = next(c for c in self.spec.columns if c.name == col)
        t = c.pg_type
        if t in ("integer", "bigint", "smallint"):
            return int(v)
        if t in ("double precision", "real"):
            return float(v)
        if t.startswith("timestamp"):
            return datetime.fromisoformat(v)
        if t in ("boolean", "bool"):
            return v in ("true", "t", "1")
        return v

    def rows(self) -> list[dict[str, Any]]:
        return [dict(v) for _, v in sorted(self.state.items(), key=lambda kv: str(kv[0]))]
