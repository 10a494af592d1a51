"""Deterministic synthetic CDC fixtures (seed=42, parameterized by scale).

Produces the three artifacts of FIXTURES.md:
  1. base lake table  ``repos(repo, path, commit, lang, content)``
  2. change-event log ``events(epoch, event_seq, commit, ts, op, repo, path,
     new_path, lang, content, schema_ver, extra_cols)``
  3. DDL side-channel  ``ddl(epoch, change, col_from, col_to, col_type)``
     (binlogs carry DDL statements as separate entries; the column-rename
     manifest of FIXTURES.md §2 travels here)

Two profiles:
  * ``generate_full``  — sequential generator covering every deterministic
    case FIXTURES.md demands (duplicate deliveries, in-batch key collisions,
    rename chains, tombstone-then-reinsert, hot-key skew, schema evolution).
    Used by pytest at xs/s scales.
  * ``generate_bulk`` — fully vectorized numpy/pandas generator for
    throughput benches (update/insert/delete mix over a fixed keyspace with
    Zipf hot-repo skew; no renames). Used by bench.py at millions of events.

Commit ids are 40-hex and lexicographically monotone in generation order
(prefix = 16-hex global sequence), so ``(commit, event_seq)`` is a total
order — the LWW dedup key of BASELINE.json.

Reference precedent for the fixture style: literal mock inputs + golden
outputs (/root/reference/src/TestHelpers.ts:69-120,
/root/reference/src/PrepareSkiData.int.test.ts:322-360).
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

LANG_EXT = {
    "python": "py",
    "typescript": "ts",
    "go": "go",
    "java": "java",
    "rust": "rs",
    "markdown": "md",
}
LANGS = list(LANG_EXT)

EVENT_FIELDS = [
    ("epoch", "long"),
    ("event_seq", "long"),
    ("commit", "string"),
    ("ts", "timestamp"),
    ("op", "string"),
    ("repo", "string"),
    ("path", "string"),
    ("new_path", "string"),
    ("lang", "string"),
    ("content", "string"),
    ("schema_ver", "int"),
    ("extra_cols", "map<string,string>"),
]

DDL_FIELDS = [
    ("epoch", "long"),
    ("change", "string"),  # 'rename_column' | 'add_column'
    ("col_from", "string"),
    ("col_to", "string"),
    ("col_type", "string"),
]

_T0 = datetime(2026, 1, 1)


def event_spark_schema():
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    return StructType(
        [
            StructField("epoch", LongType()),
            StructField("event_seq", LongType()),
            StructField("commit", StringType()),
            StructField("ts", TimestampType()),
            StructField("op", StringType()),
            StructField("repo", StringType()),
            StructField("path", StringType()),
            StructField("new_path", StringType()),
            StructField("lang", StringType()),
            StructField("content", StringType()),
            StructField("schema_ver", IntegerType()),
            StructField("extra_cols", MapType(StringType(), StringType())),
        ]
    )


def base_spark_schema():
    from pyspark.sql.types import StringType, StructField, StructType

    return StructType(
        [
            StructField("repo", StringType(), False),
            StructField("path", StringType(), False),
            StructField("commit", StringType(), False),
            StructField("lang", StringType()),
            StructField("content", StringType()),
        ]
    )


def commit_str(gseq: int) -> str:
    """40-hex, lexicographically monotone in gseq."""
    suffix = hashlib.sha1(str(gseq).encode()).hexdigest()[:24]
    return f"{gseq:016x}{suffix}"


def _make_content(rng: np.random.Generator, key: str, version: int) -> str:
    """Pseudo-code text with newline/whitespace variants (FIXTURES.md §1)."""
    n_lines = int(rng.integers(4, 40))
    lines = []
    for i in range(n_lines):
        body = f"def fn_{i}(x): return x * {int(rng.integers(1, 99))}  # {key} v{version}"
        if rng.random() < 0.2:
            body += "   "  # trailing spaces -> normalization non-trivial
        if rng.random() < 0.1:
            body += "\t"
        lines.append(body)
    sep = "\r\n" if rng.random() < 0.15 else "\n"
    text = sep.join(lines)
    if rng.random() < 0.05:
        text = text.replace(sep, "\r", 1)  # a lone CR variant
    return text


def _new_path(rng: np.random.Generator, lang: str, uid: int) -> str:
    d = rng.choice(["core", "io", "utils", "api", "models", "cli"])
    return f"src/{d}/mod_{uid}.{LANG_EXT[lang]}"


def generate_full(
    n_repos: int = 20,
    n_base_paths: int = 200,
    n_events: int = 1000,
    n_epochs: int = 5,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Sequential full-coverage generator. Returns (base, events, ddl)."""
    rng = np.random.default_rng(SEED)
    repos = [f"org{i % 7}/repo{i}" for i in range(n_repos)]
    # Zipf(s~1.2) popularity over repos
    ranks = np.arange(1, n_repos + 1, dtype=float)
    zipf_p = (1.0 / ranks**1.2) / (1.0 / ranks**1.2).sum()

    gseq = 0
    live: dict[tuple[str, str], str] = {}  # key -> lang
    uid = 0

    # ---- base table ----
    base_rows = []
    for _ in range(n_base_paths):
        repo = repos[int(rng.choice(n_repos, p=zipf_p))]
        lang = str(rng.choice(LANGS))
        uid += 1
        path = _new_path(rng, lang, uid)
        if (repo, path) in live:
            continue
        content = _make_content(rng, f"{repo}/{path}", 0)
        base_rows.append((repo, path, commit_str(gseq), lang, content))
        live[(repo, path)] = lang
        gseq += 1
    base = pd.DataFrame(
        base_rows, columns=["repo", "path", "commit", "lang", "content"]
    )

    # events get commit ords strictly above every base ord
    gseq = 1_000_000
    evo_epoch = n_epochs // 2  # extra_cols['branch','author'] from here
    rename_col_epoch = max((3 * n_epochs) // 4, evo_epoch + 1)

    events: list[dict] = []
    per_epoch = max(n_events // n_epochs, 20)

    def emit(epoch, op, repo, path, new_path=None, lang=None, content=None,
             n_in_commit=1, seq_in_commit=0, commit=None):
        nonlocal gseq
        if commit is None:
            commit = commit_str(gseq)
            gseq += 1
        schema_ver = 1
        extra = None
        if epoch >= evo_epoch and op in ("insert", "update"):
            schema_ver = 2
            extra = {
                "branch": str(rng.choice(["main", "dev", "release"])),
                "author": f"user{int(rng.integers(0, 50))}",
            }
        ev = {
            "epoch": int(epoch),
            "event_seq": int(seq_in_commit),
            "commit": commit,
            "ts": _T0 + timedelta(seconds=gseq - 1_000_000)
            + timedelta(seconds=int(rng.integers(-30, 30))),
            "op": op,
            "repo": repo,
            "path": path,
            "new_path": new_path,
            "lang": lang,
            "content": content,
            "schema_ver": schema_ver,
            "extra_cols": extra,
        }
        events.append(ev)
        return ev

    def pick_live(repo=None):
        keys = [k for k in live if repo is None or k[0] == repo]
        if not keys:
            return None
        return keys[int(rng.integers(0, len(keys)))]

    tombstone_pending: list[tuple[int, str, str, str]] = []  # (epoch, repo, path, lang)

    for epoch in range(n_epochs):
        # --- deterministic case injections (FIXTURES.md §2) ---
        # (a) in-batch key collision: >=2 updates to same key, distinct commits
        k = pick_live()
        if k:
            repo, path = k
            uid += 1
            emit(epoch, "update", repo, path, lang=live[k],
                 content=_make_content(rng, f"{repo}/{path}", uid))
            uid += 1
            emit(epoch, "update", repo, path, lang=live[k],
                 content=_make_content(rng, f"{repo}/{path}", uid))
        # (b) rename chain A->B then B->C, then update of C
        k = pick_live()
        if k:
            repo, a = k
            lang = live[k]
            uid += 1
            b = _new_path(rng, lang, uid)
            uid += 1
            c = _new_path(rng, lang, uid)
            emit(epoch, "rename", repo, a, new_path=b)
            emit(epoch, "rename", repo, b, new_path=c)
            uid += 1
            emit(epoch, "update", repo, c, lang=lang,
                 content=_make_content(rng, f"{repo}/{c}", uid))
            del live[(repo, a)]
            live[(repo, c)] = lang
        # (c) tombstone in epoch k -> reinsert same key in epoch k+2
        k = pick_live()
        if k and epoch + 2 < n_epochs:
            repo, path = k
            lang = live[k]
            emit(epoch, "delete", repo, path)
            del live[k]
            tombstone_pending.append((epoch + 2, repo, path, lang))
        for item in [t for t in tombstone_pending if t[0] == epoch]:
            _, repo, path, lang = item
            uid += 1
            emit(epoch, "insert", repo, path, lang=lang,
                 content=_make_content(rng, f"{repo}/{path}", uid))
            live[(repo, path)] = lang
            tombstone_pending.remove(item)
        # (d) one multi-event commit (atomic commit touching 2 files)
        k1, k2 = pick_live(), pick_live()
        if k1 and k2 and k1 != k2:
            c = commit_str(gseq)
            gseq += 1
            uid += 1
            emit(epoch, "update", k1[0], k1[1], lang=live[k1],
                 content=_make_content(rng, f"{k1[0]}/{k1[1]}", uid),
                 commit=c, seq_in_commit=0)
            uid += 1
            emit(epoch, "update", k2[0], k2[1], lang=live[k2],
                 content=_make_content(rng, f"{k2[0]}/{k2[1]}", uid),
                 commit=c, seq_in_commit=1)

        # --- bulk mix: ~550 update / 300 insert / 100 delete / 50 rename ---
        for _ in range(per_epoch):
            r = rng.random()
            # hot-key skew: repos[0] receives >=30% of events
            repo = repos[0] if rng.random() < 0.35 else repos[
                int(rng.choice(n_repos, p=zipf_p))
            ]
            if r < 0.55:  # update
                k = pick_live(repo) or pick_live()
                if k is None:
                    continue
                repo, path = k
                uid += 1
                emit(epoch, "update", repo, path, lang=live[k],
                     content=_make_content(rng, f"{repo}/{path}", uid))
            elif r < 0.85:  # insert
                lang = str(rng.choice(LANGS))
                uid += 1
                path = _new_path(rng, lang, uid)
                if (repo, path) in live:
                    continue
                emit(epoch, "insert", repo, path, lang=lang,
                     content=_make_content(rng, f"{repo}/{path}", uid))
                live[(repo, path)] = lang
            elif r < 0.95:  # delete
                k = pick_live(repo) or pick_live()
                if k is None:
                    continue
                emit(epoch, "delete", k[0], k[1])
                del live[k]
            else:  # rename
                k = pick_live(repo) or pick_live()
                if k is None:
                    continue
                repo, path = k
                lang = live[k]
                uid += 1
                np_ = _new_path(rng, lang, uid)
                if (repo, np_) in live:
                    continue
                emit(epoch, "rename", repo, path, new_path=np_)
                del live[k]
                live[(repo, np_)] = lang

    ev = pd.DataFrame(events)

    # --- duplicate deliveries: ~2% of events repeated verbatim later ---
    dup_pool = ev[ev["epoch"] < n_epochs - 1]
    n_dups = max(1, len(ev) // 50)
    dup_idx = rng.choice(dup_pool.index.to_numpy(), size=min(n_dups, len(dup_pool)),
                         replace=False)
    dups = ev.loc[dup_idx].copy()
    dups["epoch"] = np.minimum(dups["epoch"] + 1 + rng.integers(0, 2, len(dups)),
                               n_epochs - 1)
    ev = pd.concat([ev, dups], ignore_index=True)
    ev = ev.sort_values(["epoch", "commit", "event_seq"], kind="stable").reset_index(
        drop=True
    )

    ddl = pd.DataFrame(
        [
            {
                "epoch": int(rename_col_epoch),
                "change": "rename_column",
                "col_from": "lang",
                "col_to": "language",
                "col_type": "string",
            }
        ],
        columns=[f for f, _ in DDL_FIELDS],
    )
    return base, ev, ddl


def generate_bulk(
    n_keys: int = 200_000,
    n_events: int = 2_000_000,
    n_epochs: int = 20,
    n_repos: int = 500,
    hot_share: float = 0.35,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Vectorized bulk generator for throughput benches (no renames/DDL).

    Keyspace fixed up front; op mix 70% update / 20% insert-as-update /
    10% delete. One hot repo receives ``hot_share`` of all events.
    """
    rng = np.random.default_rng(SEED)
    repo_ids = np.arange(n_repos)
    ranks = np.arange(1, n_repos + 1, dtype=float)
    zipf_p = (1.0 / ranks**1.2) / (1.0 / ranks**1.2).sum()

    # assign each key a repo: key i -> repo via zipf, hot repo boosted
    key_repo = rng.choice(repo_ids, size=n_keys, p=zipf_p)
    hot_mask = rng.random(n_keys) < hot_share
    key_repo[hot_mask] = 0

    ev_key = rng.integers(0, n_keys, size=n_events)
    gseq = np.arange(1_000_000, 1_000_000 + n_events, dtype=np.int64)
    op_draw = rng.random(n_events)
    ops = np.where(op_draw < 0.10, "delete", "update")

    repo_names = np.array([f"org{i % 7}/repo{i}" for i in range(n_repos)])
    df = pd.DataFrame(
        {
            "epoch": (np.arange(n_events) * n_epochs // n_events).astype(np.int64),
            "event_seq": np.zeros(n_events, dtype=np.int64),
            "commit": pd.Series(gseq).map(lambda g: f"{g:016x}") + "0" * 24,
            "ts": pd.Timestamp(_T0) + pd.to_timedelta(gseq - 1_000_000, unit="s"),
            "op": ops,
            "repo": repo_names[key_repo[ev_key]],
            "path": pd.Series(ev_key).map(lambda k: f"src/gen/mod_{k}.py"),
            "new_path": pd.Series([None] * n_events, dtype=object),
            "lang": np.where(ops == "delete", None, "python"),
            "content": None,
            "schema_ver": np.ones(n_events, dtype=np.int32),
            "extra_cols": pd.Series([None] * n_events, dtype=object),
        }
    )
    # vectorized content: template pool + per-event version marker
    pool = [
        "\n".join(
            f"def fn_{j}(x):  \n    return x * {j + t}" for j in range(12)
        )
        for t in range(64)
    ]
    tmpl = pd.Series(np.array(pool, dtype=object)[ev_key % 64])
    content = tmpl + "\n# v" + pd.Series(gseq).astype(str) + "   "
    df.loc[df["op"] != "delete", "content"] = content[df["op"] != "delete"]

    base = pd.DataFrame(columns=["repo", "path", "commit", "lang", "content"])
    ddl = pd.DataFrame(columns=[f for f, _ in DDL_FIELDS])
    return base, df, ddl


def generate_bulk_chunked(
    outdir: str,
    n_keys: int = 500_000,
    n_events: int = 8_000_000,
    n_epochs: int = 4,
    n_repos: int = 500,
    hot_share: float = 0.35,
    epochs: list[int] | None = None,
) -> list[int]:
    """Epoch-at-a-time bulk generation + write: memory stays at one epoch's
    frame regardless of total size. Deterministic: the key->repo map is
    seeded once, each epoch's draws are seeded (SEED, epoch) — so epochs can
    be generated independently (``epochs`` selects a subset, letting a large
    log be produced by parallel single-epoch workers)."""
    rng0 = np.random.default_rng(SEED)
    ranks = np.arange(1, n_repos + 1, dtype=float)
    zipf_p = (1.0 / ranks**1.2) / (1.0 / ranks**1.2).sum()
    key_repo = rng0.choice(np.arange(n_repos), size=n_keys, p=zipf_p)
    key_repo[rng0.random(n_keys) < hot_share] = 0
    repo_names = np.array([f"org{i % 7}/repo{i}" for i in range(n_repos)])
    pool = np.array(
        [
            "\n".join(f"def fn_{j}(x):  \n    return x * {j + t}" for j in range(12))
            for t in range(64)
        ],
        dtype=object,
    )

    per_epoch = n_events // n_epochs
    written = []
    for ep in (epochs if epochs is not None else range(n_epochs)):
        rng = np.random.default_rng((SEED, ep))
        ev_key = rng.integers(0, n_keys, size=per_epoch)
        gseq = np.arange(
            1_000_000 + ep * per_epoch, 1_000_000 + (ep + 1) * per_epoch,
            dtype=np.int64,
        )
        ops = np.where(rng.random(per_epoch) < 0.10, "delete", "update")
        df = pd.DataFrame(
            {
                "epoch": np.full(per_epoch, ep, dtype=np.int64),
                "event_seq": np.zeros(per_epoch, dtype=np.int64),
                "commit": pd.Series(gseq).map(lambda g: f"{g:016x}") + "0" * 24,
                "ts": pd.Timestamp(_T0)
                + pd.to_timedelta(gseq - 1_000_000, unit="s"),
                "op": ops,
                "repo": repo_names[key_repo[ev_key]],
                "path": pd.Series(ev_key).map(lambda k: f"src/gen/mod_{k}.py"),
                "new_path": pd.Series([None] * per_epoch, dtype=object),
                "lang": np.where(ops == "delete", None, "python"),
                "content": None,
                "schema_ver": np.ones(per_epoch, dtype=np.int32),
                "extra_cols": pd.Series([None] * per_epoch, dtype=object),
            }
        )
        content = (
            pd.Series(pool[ev_key % 64])
            + "\n# v" + pd.Series(gseq).astype(str) + "   "
        )
        df.loc[df["op"] != "delete", "content"] = content[df["op"] != "delete"]
        write_event_log(outdir, df, None)
        written.append(ep)
        del df, content
    return written


# ---- disk layout for the streaming file source ------------------------------

_PA_EVENT_SCHEMA = pa.schema(
    [
        ("event_seq", pa.int64()),
        ("commit", pa.string()),
        ("ts", pa.timestamp("us")),
        ("op", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("new_path", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("schema_ver", pa.int32()),
        ("extra_cols", pa.map_(pa.string(), pa.string())),
    ]
)


def write_event_log(outdir: str, events: pd.DataFrame, ddl: pd.DataFrame,
                    epochs: list[int] | None = None) -> list[int]:
    """Write events partitioned ``epoch=K/part-0.parquet`` (one file per epoch
    == one micro-batch for the streaming file source) + ``ddl.parquet``."""
    os.makedirs(outdir, exist_ok=True)
    written = []
    all_epochs = sorted(events["epoch"].unique())
    for ep in all_epochs:
        if epochs is not None and ep not in epochs:
            continue
        part = events[events["epoch"] == ep].drop(columns=["epoch"])
        arrays = []
        for field in _PA_EVENT_SCHEMA:
            col = part[field.name]
            if field.name == "extra_cols":
                vals = [
                    (list(v.items()) if isinstance(v, dict) else None)
                    for v in col
                ]
                arrays.append(pa.array(vals, type=field.type))
            elif field.name == "ts":
                arrays.append(pa.Array.from_pandas(pd.to_datetime(col),
                                                   type=field.type))
            else:
                arrays.append(pa.Array.from_pandas(col, type=field.type))
        tbl = pa.Table.from_arrays(arrays, schema=_PA_EVENT_SCHEMA)
        d = os.path.join(outdir, f"epoch={int(ep)}")
        os.makedirs(d, exist_ok=True)
        # small row groups -> Spark can split one epoch file across tasks
        # (a single-row-group file would serialize every map-side stage)
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"),
                       row_group_size=8192)
        written.append(int(ep))
    if ddl is not None and len(ddl):
        # underscore dir -> invisible to Spark's file source listing
        d = os.path.join(outdir, "_ddl")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(ddl, preserve_index=False),
            os.path.join(d, "ddl.parquet"),
        )
    return written


def read_ddl(events_dir: str) -> pd.DataFrame:
    p = os.path.join(events_dir, "_ddl", "ddl.parquet")
    if not os.path.exists(p):
        return pd.DataFrame(columns=[f for f, _ in DDL_FIELDS])
    return pq.read_table(p).to_pandas()
