"""Sequential reference replayer — the golden oracle for the CDC engine.

Plays the change-event log over the base table one event at a time, in
``(commit, event_seq)`` total order within each epoch, applying exactly the
semantics the Spark engine must reproduce set-based:

- LWW: an event applies only if its ord ``(commit, event_seq)`` is greater
  than the current ord of its key (stale duplicate deliveries are no-ops —
  mirrors the reference's idempotent ON CONFLICT upsert,
  /root/reference/src/io/PostGISDataStore.ts:75-85,829-850).
- insert/update: full-row image replaces the key's payload.
- delete: key becomes a tombstone carrying the delete's ord (tombstones are
  retained so later stale duplicates cannot resurrect rows).
- rename(old->new): if old is live and the rename is newer, the payload moves
  to new with ord = rename ord and old becomes a tombstone; otherwise no-op.
- schema evolution: every ``extra_cols`` key ever observed is promoted to a
  typed (string) column (mirrors JSONB -> typed-column promotion,
  /root/reference/src/io/PostGISDataStore.ts:800-827); DDL ``rename_column``
  renames by field identity — values written under the old name stay bound.

The oracle is intentionally the dumbest possible implementation (a dict and a
for-loop) so it can serve as ground truth for the distributed engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from skipmap_processor_spark.functions.udfs import sha256_py

# internal field names never change; display names are mapped at the end
_PAYLOAD_FIELDS = ["lang", "content"]


@dataclass
class _State:
    commit: str
    event_seq: int
    deleted: bool
    lang: str | None = None
    content: str | None = None
    extra: dict = field(default_factory=dict)

    @property
    def ord(self) -> tuple[str, int]:
        return (self.commit, self.event_seq)


def apply_event(
    state: dict[tuple[str, str], _State],
    *,
    op: str,
    repo: str,
    path: str,
    new_path: str | None,
    commit: str,
    event_seq: int,
    lang: str | None,
    content: str | None,
    extra: dict | None,
) -> list[tuple[str, str]]:
    """Apply ONE event to the keyed state dict; returns the keys it changed.

    This is the single source of truth for CDC apply semantics — the oracle
    replayer iterates it event-by-event, and the engine's rename-chain
    resolver (operators/dedup.py) calls the very same function inside
    ``applyInPandas`` groups, so set-based and sequential paths cannot drift.
    Caller must feed events in ascending ``(commit, event_seq)`` order.
    """
    key = (repo, path)
    ord_ = (commit, int(event_seq))
    cur = state.get(key)
    if cur is not None and ord_ <= cur.ord:
        return []  # stale duplicate delivery

    if op in ("insert", "update"):
        state[key] = _State(
            commit=commit, event_seq=int(event_seq), deleted=False,
            lang=lang, content=content, extra=dict(extra or {}),
        )
        return [key]
    if op == "delete":
        state[key] = _State(
            commit=commit, event_seq=int(event_seq), deleted=True,
        )
        return [key]
    if op == "rename":
        if cur is None or cur.deleted:
            return []  # nothing to move
        changed = [key]
        new_key = (repo, new_path)
        new_cur = state.get(new_key)
        if new_cur is None or ord_ > new_cur.ord:
            state[new_key] = _State(
                commit=commit, event_seq=int(event_seq), deleted=False,
                lang=cur.lang, content=cur.content, extra=dict(cur.extra),
            )
            changed.append(new_key)
        state[key] = _State(
            commit=commit, event_seq=int(event_seq), deleted=True,
        )
        return changed
    raise ValueError(f"unknown op {op!r}")


def replay(
    base: pd.DataFrame,
    events: pd.DataFrame,
    ddl: pd.DataFrame | None = None,
    include_tombstones: bool = False,
) -> pd.DataFrame:
    """Replay events over base; return the final table as pandas.

    Output columns: repo, path, commit, event_seq, <lang-or-renamed>,
    content, content_sha, plus every promoted extra column, plus
    ``is_deleted`` when ``include_tombstones``.
    """
    state: dict[tuple[str, str], _State] = {}
    for row in base.itertuples(index=False):
        state[(row.repo, row.path)] = _State(
            commit=row.commit, event_seq=0, deleted=False,
            lang=row.lang, content=row.content,
        )

    promoted: list[str] = []  # extra_cols keys in first-seen order
    name_map: dict[str, str] = {f: f for f in _PAYLOAD_FIELDS}

    ddl_by_epoch: dict[int, list] = {}
    if ddl is not None and len(ddl):
        for row in ddl.itertuples(index=False):
            ddl_by_epoch.setdefault(int(row.epoch), []).append(row)

    events = events.sort_values(["epoch", "commit", "event_seq"], kind="stable")
    seen_epochs: list[int] = []
    for ev in events.itertuples(index=False):
        ep = int(ev.epoch)
        if ep not in seen_epochs:
            seen_epochs.append(ep)
            for d in ddl_by_epoch.get(ep, []):
                if d.change == "rename_column":
                    # rename by field identity: old internal name keeps the data
                    for k, v in list(name_map.items()):
                        if v == d.col_from:
                            name_map[k] = d.col_to
                elif d.change == "add_column":
                    if d.col_to not in promoted:
                        promoted.append(d.col_to)

        extra = dict(ev.extra_cols) if isinstance(ev.extra_cols, dict) else {}
        for k in extra:
            if k not in promoted:
                promoted.append(k)
                name_map.setdefault(k, k)
        apply_event(
            state,
            op=ev.op,
            repo=ev.repo,
            path=ev.path,
            new_path=ev.new_path,
            commit=ev.commit,
            event_seq=int(ev.event_seq),
            lang=ev.lang,
            content=ev.content,
            extra=extra,
        )

    rows = []
    for (repo, path), st in state.items():
        if st.deleted and not include_tombstones:
            continue
        row = {
            "repo": repo,
            "path": path,
            "commit": st.commit,
            "event_seq": st.event_seq,
            name_map["lang"]: st.lang,
            "content": st.content,
            "content_sha": sha256_py(st.content),
        }
        for k in promoted:
            row[name_map.get(k, k)] = st.extra.get(k)
        if include_tombstones:
            row["is_deleted"] = st.deleted
        rows.append(row)

    cols = ["repo", "path", "commit", "event_seq", name_map["lang"],
            "content", "content_sha"] + [name_map.get(k, k) for k in promoted]
    if include_tombstones:
        cols.append("is_deleted")
    out = pd.DataFrame(rows, columns=cols)
    return out.sort_values(["repo", "path"]).reset_index(drop=True)
