"""Custom stateful streaming operators (applyInPandasWithState).

The batch twins live in ``windows.py`` (lag/cumsum sessionize) and
``operators/dedup.py`` (hash-groupBy exact dedup); these are their
unbounded-source equivalents: per-key state survives micro-batches,
GroupStateTimeout evicts idle keys so state stays bounded — the
Structured Streaming contract a 100 TB/day event feed needs.

Semantics note (standard for stateful streaming): rows are processed
in arrival order per micro-batch (sorted by event time WITHIN each
batch); cross-batch out-of-order data moves session boundaries — use
the watermarked window aggregations in ``windows.py`` when event-time
exactness matters more than session continuity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import (GroupState, GroupStateTimeout)

SESSION_STATE = T.StructType([
    T.StructField("last_epoch", T.LongType()),
    T.StructField("session_seq", T.LongType()),
])

DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def sessionize_stream(events: DataFrame, *, gap_minutes: int = 30,
                      user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id",
                      idle_timeout_s: int = 7200) -> DataFrame:
    """Streaming sessionize: per-user (last_ts, session_seq) state.

    Output rows mirror :func:`windows.sessionize`: (user, event id,
    epoch seconds, session_seq). State for users idle longer than
    ``idle_timeout_s`` of processing time is dropped (their next event
    starts a new session — consistent with any gap > the timeout).
    """
    gap_s = gap_minutes * 60
    out_schema = T.StructType([
        events.schema[user_col],
        events.schema[id_col],
        T.StructField("epoch", T.LongType()),
        T.StructField("session_seq", T.LongType()),
    ])

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        last, seq = state.get if state.exists else (None, 0)
        # applyInPandasWithState may deliver one key's micro-batch as
        # SEVERAL chunks; event-time order must hold across the whole
        # batch, so concatenate (group-bounded) before sorting
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((last, seq))
            state.setTimeoutDuration(idle_timeout_s * 1000)
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 \
            else chunks[0]
        pdf = pdf.sort_values(
            [ts_col] + ([id_col] if id_col in pdf else []))
        epochs = (pd.to_datetime(pdf[ts_col]).astype("int64")
                  // 1_000_000_000)
        seqs = []
        for e in epochs:
            if last is None or e - last > gap_s:
                seq += 1
            last = int(e)
            seqs.append(seq)
        state.update((last, seq))
        state.setTimeoutDuration(idle_timeout_s * 1000)
        yield pd.DataFrame({
            user_col: pdf[user_col].to_numpy(),
            id_col: pdf[id_col].to_numpy(),
            "epoch": epochs.to_numpy(),
            "session_seq": seqs,
        })

    src = events.withColumn(ts_col, events[ts_col].cast("timestamp"))
    return (src.groupBy(user_col)
            .applyInPandasWithState(fn, out_schema, SESSION_STATE,
                                    "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


def dedup_stream(df: DataFrame, *, key_col: str = "digest",
                 id_col: str = "doc_id",
                 idle_timeout_s: int | None = None) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST row per key across
    the whole stream (the batch ``exact_dedup`` keeper semantics,
    ``operators/dedup.py``). State per key is one boolean; pass
    ``idle_timeout_s`` to bound state on unbounded key spaces (keys
    recurring after eviction re-emit — the documented trade of every
    TTL'd dedup).
    """
    out_schema = T.StructType([df.schema[key_col], df.schema[id_col]])
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_s
               else GroupStateTimeout.NoTimeout)

    def fn(key, pdfs, state: GroupState):
        if getattr(state, "hasTimedOut", False):
            state.remove()
            return
        if not state.exists:
            # min-id across the WHOLE micro-batch (chunks may split a
            # key's rows): the batch exact_dedup keeper is the global
            # min id, so scan every chunk before choosing
            best = None
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                first = pdf.sort_values(id_col).iloc[:1]
                if best is None or (first[id_col].iloc[0]
                                    < best[id_col].iloc[0]):
                    best = first
            if best is not None:
                yield best[[key_col, id_col]]
                state.update((True,))
        if state.exists and idle_timeout_s:
            state.setTimeoutDuration(idle_timeout_s * 1000)

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, DEDUP_STATE,
                                    "append", timeout))


GEOFENCE_STATE = T.StructType([
    T.StructField("inside", T.ArrayType(T.LongType())),
])


def geofence_stream(events: DataFrame, fences: list, *,
                    user_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id",
                    x_col: str = "x", y_col: str = "y",
                    idle_timeout_s: int | None = None) -> DataFrame:
    """Streaming twin of ``operators/zonal.geofence_transitions`` —
    real-time enter/exit alerts: per-user state is the SET of fences
    the user was last seen inside (one array per key); each
    micro-batch re-evaluates closed-box containment map-side against
    the static ``fences`` list (a driver-small dimension, shipped in
    the closure like any broadcast dim — no stream-side join, no
    aggregation before the stateful op) and emits the set difference
    both ways. Output rows: ``(user, event id, fence_id, kind)``,
    identical to the batch twin on ordered feeds (pytest-pinned,
    including state carrying an OPEN stay across micro-batches).

    ``fences``: list of ``(fence_id, minx, miny, maxx, maxy)`` ints.
    Same ordering contract as the other stateful ops: rows sort by
    event time within each batch; cross-batch late data re-orders
    transitions (use the batch twin for event-time-exact audits).
    State per key is one bounded array; ``idle_timeout_s`` evicts
    idle users (their next event re-enters fences afresh — the
    documented TTL trade).
    """
    if not fences:
        raise ValueError("geofence_stream: fences must be non-empty")
    import numpy as np
    farr = np.asarray([[f[0], f[1], f[2], f[3], f[4]] for f in fences],
                      dtype=np.int64)
    out_schema = T.StructType([
        events.schema[user_col],
        events.schema[id_col],
        T.StructField("fence_id", T.LongType()),
        T.StructField("kind", T.StringType()),
    ])
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_s
               else GroupStateTimeout.NoTimeout)

    def fn(key, pdfs, state: GroupState):
        if getattr(state, "hasTimedOut", False):
            state.remove()
            return
        prev = set(state.get[0]) if state.exists else set()
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if state.exists or prev:
                state.update((sorted(prev),))
            if idle_timeout_s:
                state.setTimeoutDuration(idle_timeout_s * 1000)
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 \
            else chunks[0]
        pdf = pdf.sort_values([ts_col, id_col])
        xs = pdf[x_col].to_numpy(dtype="int64")
        ys = pdf[y_col].to_numpy(dtype="int64")
        # (events x fences) containment in one vectorized pass:
        # fences is a driver-small dim, so this is the broadcast side
        ins = ((xs[:, None] >= farr[None, :, 1])
               & (xs[:, None] <= farr[None, :, 3])
               & (ys[:, None] >= farr[None, :, 2])
               & (ys[:, None] <= farr[None, :, 4]))
        users, eids, fids, kinds = [], [], [], []
        uvals = pdf[user_col].to_numpy()
        evals = pdf[id_col].to_numpy()
        for i in range(len(pdf)):
            cur = set(farr[ins[i], 0].tolist())
            for f in sorted(cur - prev):
                users.append(uvals[i]); eids.append(evals[i])
                fids.append(f); kinds.append("enter")
            for f in sorted(prev - cur):
                users.append(uvals[i]); eids.append(evals[i])
                fids.append(f); kinds.append("exit")
            prev = cur
        state.update((sorted(prev),))
        if idle_timeout_s:
            state.setTimeoutDuration(idle_timeout_s * 1000)
        yield pd.DataFrame({user_col: users, id_col: eids,
                            "fence_id": fids, "kind": kinds})

    src = events.withColumn(ts_col, events[ts_col].cast("timestamp"))
    return (src.groupBy(user_col)
            .applyInPandasWithState(fn, out_schema, GEOFENCE_STATE,
                                    "append", timeout))


#: flow_stream state: last (x, y) position per key
FLOW_STATE = T.StructType([
    T.StructField("lx", T.LongType()),
    T.StructField("ly", T.LongType()),
])


def flow_stream(events: DataFrame, *, cell: int,
                user_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id",
                x_col: str = "x", y_col: str = "y",
                idle_timeout_s: int | None = None) -> DataFrame:
    """Streaming displacement feed — the stateful front half of
    ``operators/zonal.flow_field``: per-user state is the LAST
    position; each micro-batch orders its rows by event time and
    emits one displacement per consecutive move, INCLUDING the move
    that crosses the micro-batch boundary (the stateless failure
    mode — pytest-pinned). Output rows: ``(user, cx, cy, dx, dy)``
    with (cx, cy) the ORIGIN cell — feed them to any sink and the
    batch flow_field aggregation over the collected rows equals the
    batch-twin field on ordered feeds.

    Same ordering contract as the other stateful ops (rows sort by
    event time within a batch; cross-batch late data re-orders
    displacements — the batch twin is the event-time-exact audit).
    ``idle_timeout_s`` evicts idle users; their next event starts a
    fresh track (documented TTL trade).
    """
    if cell < 1:
        raise ValueError("flow_stream: cell must be >= 1")
    out_schema = T.StructType([
        events.schema[user_col],
        T.StructField("cx", T.LongType()),
        T.StructField("cy", T.LongType()),
        T.StructField("dx", T.LongType()),
        T.StructField("dy", T.LongType()),
    ])
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_s
               else GroupStateTimeout.NoTimeout)

    def fn(key, pdfs, state: GroupState):
        if getattr(state, "hasTimedOut", False):
            state.remove()
            return
        last = state.get if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            if last is not None:
                state.update(last)
            if idle_timeout_s:
                state.setTimeoutDuration(idle_timeout_s * 1000)
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 \
            else chunks[0]
        pdf = pdf.sort_values([ts_col, id_col])
        xs = pdf[x_col].to_numpy(dtype="int64")
        ys = pdf[y_col].to_numpy(dtype="int64")
        users, cxs, cys, dxs, dys = [], [], [], [], []
        uval = key[0]
        px, py = (last[0], last[1]) if last is not None else (None,
                                                             None)
        for i in range(len(pdf)):
            if px is not None:
                users.append(uval)
                # trunc-toward-zero in exact integer arithmetic,
                # matching the batch twin's Spark DIV (round-5 ADVICE:
                # Python // floors, which disagrees for negative
                # coordinates; float division would lose exactness
                # past 2^53)
                cxs.append(-(-px // cell) if px < 0 else px // cell)
                cys.append(-(-py // cell) if py < 0 else py // cell)
                dxs.append(int(xs[i]) - px)
                dys.append(int(ys[i]) - py)
            px, py = int(xs[i]), int(ys[i])
        state.update((px, py))
        if idle_timeout_s:
            state.setTimeoutDuration(idle_timeout_s * 1000)
        yield pd.DataFrame({user_col: users, "cx": cxs, "cy": cys,
                            "dx": dxs, "dy": dys})

    src = events.withColumn(ts_col, events[ts_col].cast("timestamp"))
    return (src.groupBy(user_col)
            .applyInPandasWithState(fn, out_schema, FLOW_STATE,
                                    "append", timeout))
