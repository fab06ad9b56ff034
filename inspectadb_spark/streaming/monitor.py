"""Streaming CUSUM change-point monitor (SURVEY.md §2.2k arbitrary-stateful
+ §2.2m q155 in streaming form).

The batch operator (operators/timeseries.py::cusum_alerts) uses the window
closed form; the stream uses the recursion directly — per-key state is the
triple (running P, running min-prefix P, alert stats), updated per
micro-batch with ``applyInPandasWithState``. All arithmetic is integer
cents (the corpus values carry 2 decimals), so after draining any chunked
replay the final per-key (n_alerts, max_cusum, n) equals the batch
operator EXACTLY — asserted in S24.

State is O(1) per key (five integers) for the life of the stream; each
micro-batch sorts only its own rows per key. Requires the source to be
time-ordered per key across micro-batches (true of replayed logs and of
any per-key-FIFO bus); out-of-order arrivals need a watermark + sort
buffer upstream, which changes the state shape, not the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_OUT_SCHEMA = "key string, n_alerts bigint, max_s_cents bigint, n bigint"
_STATE_SCHEMA = "p bigint, minp bigint, n_alerts bigint, max_s bigint, n bigint"


def streaming_cusum(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    k_cents: int,
    h_cents: int,
) -> DataFrame:
    """Per-key one-sided CUSUM over a stream; emits the running
    (n_alerts, max_s_cents, n) per key each micro-batch (update mode)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdf_iter, state: GroupState):
        p, minp, n_alerts, max_s, n = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        # concatenate BEFORE sorting: the iterator yields Arrow-sized chunks
        # of this key's batch rows in partition order, which is not time
        # order across chunks
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = pd.concat(chunks).sort_values([ts_col, id_col])
            v = np.round(pdf[value_col].to_numpy() * 100).astype(np.int64)
            ps = p + np.cumsum(v - k_cents)
            run_min = np.minimum.accumulate(np.minimum(ps, minp))
            s = ps - np.minimum(run_min, 0)
            n_alerts += int((s > h_cents).sum())
            if len(s):
                max_s = max(max_s, int(s.max()))
                p, minp = int(ps[-1]), int(run_min[-1])
            n += len(pdf)
        state.update((int(p), int(minp), int(n_alerts), int(max_s), int(n)))
        yield pd.DataFrame(
            {"key": [key[0]], "n_alerts": [n_alerts],
             "max_s_cents": [max_s], "n": [n]}
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            track, _OUT_SCHEMA, _STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


_GAP_STATE = ("last_us bigint, n_gaps bigint, min_gap_s bigint, "
              "max_gap_s bigint, sum_s bigint, sum_sq bigint")


def streaming_gap_profile(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Live per-key inter-event gap statistics (q206's bot-screening
    features) maintained with O(1) state: (last event µs, n, min, max,
    Σgap, Σgap²) per key, updated per micro-batch with
    ``applyInPandasWithState``.

    The gap recurrence needs the PREVIOUS event — exactly the cross-batch
    state a windowed aggregate cannot carry — so this is the
    arbitrary-stateful form; after draining a time-ordered chunked replay
    the state equals the batch q206 sufficient statistics EXACTLY (S31).
    Same in-order-per-key delivery contract as streaming_cusum; Σgap² is
    BIGINT with gap in integer seconds (gap ≤ ~3e7 s ⇒ gap² ≤ 9e14,
    ~9e3 years of per-second events before overflow; promote to the
    DECIMAL(38,0) state column beyond that).

    The output schema's key column carries ``key_col``'s own NAME AND
    TYPE (taken from the input schema) — a hardcoded ``user_id bigint``
    would crash Arrow conversion for any string/decimal key.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = stream.schema[key_col].dataType.simpleString()
    gap_out = (f"{key_col} {key_type}, n_gaps bigint, min_gap_s bigint, "
               "max_gap_s bigint, sum_s bigint, sum_sq bigint")

    def track(key, pdf_iter, state: GroupState):
        last_us, n_gaps, mn, mx, sum_s, sum_sq = (
            state.get if state.exists else (None, 0, None, None, 0, 0)
        )
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = pd.concat(chunks).sort_values([ts_col, id_col])
            us = (pdf[ts_col].astype("datetime64[us]").astype("int64")
                  .to_numpy())
            prev = np.concatenate(
                ([last_us], us[:-1])) if last_us is not None else us[:-1]
            cur = us if last_us is not None else us[1:]
            if len(cur):
                gaps = (cur - prev) // 1_000_000
                n_gaps += len(gaps)
                gmn, gmx = int(gaps.min()), int(gaps.max())
                mn = gmn if mn is None else min(mn, gmn)
                mx = gmx if mx is None else max(mx, gmx)
                sum_s += int(gaps.sum())
                sum_sq += int((gaps.astype(object) ** 2).sum())
            last_us = int(us[-1])
        state.update((last_us, int(n_gaps),
                      mn, mx, int(sum_s), int(sum_sq)))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_gaps": [n_gaps],
             "min_gap_s": [mn], "max_gap_s": [mx],
             "sum_s": [sum_s], "sum_sq": [sum_sq]}
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            track, gap_out, _GAP_STATE, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def streaming_orphan_monitor(
    stream: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    window: str = "1 hour",
    ts_col: str = "ts",
    delay: str | None = "2 hours",
) -> DataFrame:
    """Streaming referential-integrity monitor: per event-time window, how
    many arriving child rows have no matching parent key (rows + ppm rate;
    DISTINCT-key attribution stays in the batch audit, q240 — streaming
    aggregates cannot carry exact distincts) — the live orphan-rate feed a CDC pipeline alerts on when an
    upstream table starts emitting keys the dimension hasn't seen.

    Composition: a stream-static LEFT join against the parent's DISTINCT
    key domain (dimension-sized -> broadcast; the static side is re-read
    per micro-batch, so a slowly-refreshing parent is picked up without
    restarts), then a standard tumbling-window aggregate. Batch-replaying
    the stream gives IDENTICAL counts (asserted in S35) because nothing
    here is stateful beyond the window agg itself.

    ``delay`` is the watermark bound: without one, a long-running
    continuous query accumulates window state without limit and
    append-mode sinks never emit (windows never finalize) — the monitor
    would only behave under availableNow/complete drains. The default 2h
    tolerates late children at the cost of holding ~delay/window open
    windows of state; q246's disorder profile computes the right delay
    for a real feed. Pass ``delay=None`` only for bounded replay drains.
    On a batch DataFrame the watermark is a no-op, so the batch-replay
    equivalence (S35) holds either way.

    100 TB design: the only stream-sized operation is the broadcast probe
    (no shuffle of the child rows before the window agg's one exchange);
    parent domains too big to broadcast swap in the q181 Bloom filter as
    the probe side at the cost of a false-positive-bounded orphan
    UNDERcount — the monitor stays one-sided either way.
    """
    from pyspark.sql import functions as F

    if delay is not None:
        stream = stream.withWatermark(ts_col, delay)
    pkd = F.broadcast(
        parent.select(F.col(pk_col).alias("__pk")).distinct())
    probed = stream.join(
        pkd, stream[fk_col] == F.col("__pk"), "left")
    return (
        probed.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("__pk").isNull().cast("bigint")).alias("n_orphan_rows"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "n_rows", "n_orphan_rows",
            F.expr("n_orphan_rows * 1000000 DIV n_rows").alias("orphan_ppm"),
        )
    )
