"""Checkpoint bootstrap for the SHARDED stateful streams.

The r8 sharding rewrite (see :mod:`emiproc_spark.streaming.streams`,
module docstring) made two upgrade events require a FRESH
``checkpointLocation``: the state-schema/grouping-key change itself,
and any change of the shard count (a silent divergence, not a startup
error).  Without tooling, "fresh checkpoint" means replaying the full
source — at 100 TB that is days of recompute and, worse for the
near-dup stream, a re-emission of every historical pair into
downstream sinks.

These helpers rebuild the operators' state through their OWN fold
instead: each turns a BATCH SNAPSHOT of the already-processed history
into a small synthetic input frame that, fed as the first
micro-batch(es) of the new incarnation, reconstructs the exact state
under WHATEVER ``n_shards`` the new query derives — the shard hash is
applied by the stream itself, so no knowledge of the layout is baked
into the bootstrap data.  Spark's ``applyInPandasWithState`` exposes no
initial-state API and the HDFS-backed state files are a private format;
routing the snapshot through the fold is the supported, layout-agnostic
path (the same approach Spark's own ``transformWithState`` initial-state
feature automates).

Operationally: write the bootstrap frame as the FIRST file(s) of the
new query's file source (older mtime than any live file — the file
source processes oldest-first; :func:`write_ordered_file` does this
with pinned mtimes), or any equivalent processed-before-live
arrangement.  Keep the bootstrap's mtime within the source's
``maxFileAge`` (default 7 days, measured against the NEWEST listed
file) — a distant-past stamp gets silently filtered out the moment a
live file lands, partially rebuilding state with no error.  Outputs
during the bootstrap batch:

- ``funnel_bootstrap_events`` emits NOTHING (no flush sentinels ride
  along);
- ``neardup_bootstrap_docs`` emits NOTHING (the ``__bootstrap`` flag
  suppresses pair emission while rebuilding bucket membership);
- ``cdc_bootstrap_changes`` re-emits one ``ver=1`` row per key (update
  mode re-emission; the latest-``ver``-per-key read contract makes it
  harmless, and ``ver`` restarts with the new incarnation's sink
  anyway).

Snapshot sources: the matching BATCH operators over the processed
history (``funnel_user_steps``, ``operators.history.latest_snapshot``
/ ``apply_changelog``), or for near-dup simply the processed corpus —
all recomputable far cheaper than a stateful replay, and typically
already materialized by the nightly batch jobs.

After bootstrapping, pin the NEW incarnation's shard count to its
fresh checkpoint with ``streams.pin_shards_to_checkpoint`` so the next
resize is a startup error instead of the silent divergence that forced
this flow in the first place.
"""

from __future__ import annotations

import threading as _threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: How far behind "now" :func:`write_ordered_file` pins its first
#: file's mtime.  Deliberately WELL INSIDE the file source's default
#: ``maxFileAge`` (7 days): the source ignores files older than
#: ``maxFileAge`` relative to the NEWEST file it has seen, so a
#: bootstrap file stamped in the distant past would be silently
#: skipped the moment any live file with a current mtime lands —
#: partial state rebuild, silent divergence.  One hour back orders the
#: bootstrap ahead of any live file written after it while staying
#: ~167x inside the age cutoff.
ORDERED_FILE_MTIME_LAG_S = 3600


def write_ordered_file(df: DataFrame, d: str, order: int) -> None:
    """Write ``df`` as ONE parquet file into directory ``d`` with a
    pinned mtime so that, under ``maxFilesPerTrigger=1``, micro-batch
    ``order`` is exactly this frame.

    This is the mechanical half of the module's operational contract —
    "write the bootstrap frame as the FIRST file(s) of the new query's
    file source": the file source processes files oldest-first, and
    relying on wall-clock write order is racy at second granularity on
    some filesystems.  Mtimes are pinned NEAR now (``now − 1 h``,
    stepping 1 s per ``order``) rather than to a fixed epoch — see
    ``ORDERED_FILE_MTIME_LAG_S`` for why a distant-past stamp would
    make the source's ``maxFileAge`` filter silently drop the
    bootstrap.  If live files can lag the bootstrap write by more than
    ~7 days, set the reader's ``maxFileAge`` option accordingly.
    Local-filesystem paths only (the mtime pin goes through
    ``os.utime``); the base is captured once per directory so repeated
    calls keep a stable, strictly increasing order."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import time as _time

    tmp = d + f".tmp{order}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = _glob.glob(_os.path.join(tmp, "part-*.parquet"))[0]
    _os.makedirs(d, exist_ok=True)
    ad = _os.path.abspath(d)
    # cache hygiene (r11 advisor): evict entries whose directory is
    # gone (the map otherwise grows unboundedly in a long-lived
    # driver), and re-anchor when the directory holds no ordered files
    # — a deleted-and-recreated path must NOT inherit the old session's
    # base, or its files get stamped with a stale (possibly
    # maxFileAge-expired) mtime
    # base bookkeeping under a lock: concurrent writers of DIFFERENT
    # orders into one directory (a caller overlapping its slice writes)
    # must agree on ONE base — an unsynchronized re-anchor between a
    # peer's setdefault and its copyfile could hand two writers bases
    # drifting apart by more than the 1 s order step
    with _ORDERED_FILE_LOCK:
        for k in list(_ORDERED_FILE_BASES):
            if not _os.path.isdir(k):
                _ORDERED_FILE_BASES.pop(k, None)
        if ad not in _ORDERED_FILE_PENDING and not _glob.glob(
            _os.path.join(d, "f*.parquet")
        ):
            _ORDERED_FILE_BASES.pop(ad, None)
        base = _ORDERED_FILE_BASES.setdefault(
            ad, _time.time() - ORDERED_FILE_MTIME_LAG_S
        )
        _ORDERED_FILE_PENDING[ad] = _ORDERED_FILE_PENDING.get(ad, 0) + 1
    try:
        dst = _os.path.join(d, f"f{order}.parquet")
        _shutil.copyfile(part, dst)
        t = base + order
        _os.utime(dst, (t, t))
    finally:
        with _ORDERED_FILE_LOCK:
            n = _ORDERED_FILE_PENDING.get(ad, 1) - 1
            if n <= 0:
                _ORDERED_FILE_PENDING.pop(ad, None)
            else:
                _ORDERED_FILE_PENDING[ad] = n
    _shutil.rmtree(tmp)


#: Per-directory mtime base for :func:`write_ordered_file`, captured at
#: the directory's first write so later orders stay strictly newer no
#: matter how much wall-clock time the frames' computation takes.
#: Entries are evicted when their directory disappears, and a directory
#: with no ordered files left re-anchors on its next write (so a
#: deleted-and-recreated path never reuses a stale base).
_ORDERED_FILE_BASES: dict[str, float] = {}

#: Directories with an ordered write IN FLIGHT (base chosen, file not
#: yet copied) and the number of such writers — the empty-directory
#: re-anchor must not fire for these, or a concurrent peer's files get
#: a drifted base.  Guarded by :data:`_ORDERED_FILE_LOCK`.
_ORDERED_FILE_PENDING: dict[str, int] = {}

_ORDERED_FILE_LOCK = _threading.Lock()


def funnel_bootstrap_events(
    snapshot: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Synthetic events that rebuild ``funnel_stream`` state from a
    per-key step-stamp snapshot.

    ``snapshot`` is the funnel schema itself — (``key_col``,
    ``step1_ts`` … ``stepN_ts``), i.e. ``funnel_user_steps`` over the
    already-processed events (the stream's own flush rows have the same
    shape but flushed keys hold no state to rebuild).  For each
    non-NULL step *i* stamp the helper emits one ``steps[i]`` event at
    that exact timestamp.  Replayed through the fold these fill the
    SAME slots: stamps strictly increase along a funnel chain (the
    strict-``>`` rule of both producers), so processing them in
    timestamp order fills step *i* with its original stamp; a NULL at
    step *i* implies NULLs after it (both producers' invariant), so
    emitting nothing there leaves the chain broken exactly where it
    was.  All-NULL keys contribute no events — absent state and
    all-unreached state are indistinguishable to the fold.

    The output is (``key_col``, ``ts_col``, ``type_col``), one row per
    reached step; add any extra columns of your live schema (e.g. a
    tiebreak id) afterwards — the fold ignores them.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    missing = [
        f"step{i + 1}_ts"
        for i in range(len(steps))
        if f"step{i + 1}_ts" not in snapshot.columns
    ]
    if missing:
        raise ValueError(
            f"snapshot lacks step column(s) {missing} — expected the "
            "funnel_user_steps / funnel_stream output schema"
        )
    step_structs = F.array(
        *[
            F.struct(
                F.col(f"step{i + 1}_ts").alias("ts"),
                F.lit(s).alias("et"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        snapshot.select(
            F.col(key_col),
            F.explode(F.filter(step_structs, lambda r: r["ts"].isNotNull())).alias(
                "__e"
            ),
        )
        .select(
            F.col(key_col),
            F.col("__e.ts").alias(ts_col),
            F.col("__e.et").alias(type_col),
        )
    )


def cdc_bootstrap_changes(
    snapshot: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "tsn",
    tb_col: str = "event_id",
    value_cols: tuple[str, str] = ("event_type", "value"),
    op_col: str = "op",
) -> DataFrame:
    """Changelog rows that rebuild ``changelog_state_stream`` state from
    a latest-wins snapshot.

    ``snapshot`` holds one row per key — the (ts, tiebreak)-maximal
    change, INCLUDING delete markers (a delete is state too: it must
    keep outranking late-arriving older upserts).  That is exactly what
    ``operators.history.latest_snapshot`` over the processed feed
    returns, or the stream's own output at the latest ``ver`` per key.
    Because the fold is a (ts, tiebreak)-max, feeding the maxima back
    through it is idempotent: state after the bootstrap batch equals
    state after a full replay.  The original (ts, tiebreak) MUST ride
    along unchanged — re-stamping would let older live changes lose or
    win incorrectly.

    The helper validates the columns and passes the rows through —
    the contract (what a valid snapshot is, what happens to ``ver``)
    is the point; see the module docstring for the ``ver=1``
    re-emission note.
    """
    need = [key_col, ts_col, tb_col, *value_cols, op_col]
    missing = [c for c in need if c not in snapshot.columns]
    if missing:
        raise ValueError(
            f"snapshot lacks column(s) {missing} required by "
            "changelog_state_stream"
        )
    return snapshot.select(*need)


def neardup_bootstrap_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bootstrap_col: str = "__bootstrap",
) -> DataFrame:
    """Flag the already-processed corpus for state-only admission into
    ``near_dup_stream``.

    The near-dup state (bucket → member/overflow ids) is derived
    entirely from the documents, so the snapshot IS the processed
    corpus (id + text — the minhash/banding recomputes the buckets
    under the new query's parameters, which also makes this the
    upgrade path for changed ``n``/``k``/``bands``).  The flag makes
    the fold admit these ids to bucket membership WITHOUT emitting
    pairs — a plain replay would re-emit every historical pair into
    downstream sinks.

    Membership order: the fold admits a batch's bootstrap ids sorted
    ascending, so feed the corpus as ONE micro-batch (or accept that
    multi-batch bootstrap admits batch-by-batch, like the original
    arrival order did).  For buckets under ``max_bucket`` the rebuilt
    membership is exact regardless; only over-cap (stop-shingle)
    buckets can differ in WHICH ids hold member slots, and those
    buckets are pairing-noise by definition.

    Live files need no physical flag column: declare ``bootstrap_col``
    BOOLEAN in the file-source read schema and parquet files lacking it
    read as NULL, which the stream coalesces to false.
    """
    if bootstrap_col in docs.columns:
        raise ValueError(
            f"docs already has a {bootstrap_col!r} column — pass "
            "bootstrap_col= to pick a different marker"
        )
    return docs.select(
        F.col(id_col), F.col(text_col), F.lit(True).alias(bootstrap_col)
    )
