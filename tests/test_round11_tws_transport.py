"""Round-11: the ``transformWithStateInPandas`` transport actually
executes (round-10 verdict task 5).

The container ships no ``google.protobuf`` and has no network, so the
engine vendors a minimal pure-python protobuf runtime
(``_vendor/google/protobuf`` — wire format + descriptor parsing from
the public specs) that makes pyspark's generated ``StateMessage_pb2``
module work.  Pinned here:

* the vendored runtime round-trips the actual state-server message
  shapes (oneofs, nested messages, write-through ttl presence,
  repeated bytes/messages, enums, negative int64);
* BOTH transports of ``daily_kpi_running`` and ``user_topk_events``
  execute in this session — the primary TWS path against the real JVM
  state server (RocksDB provider) and the ``applyInPandasWithState``
  fallback — and fold to identical results;
* ``daily_kpi_running.api == "transformWithStateInPandas"`` on the
  primary path (the verdict's literal done-criterion).
"""

from __future__ import annotations

import os

KPI_ROWS_SCHEMA = (
    "date_key string, kind string, user_id long, revenue_cents bigint, "
    "returned long"
)


def test_vendored_protobuf_roundtrips_state_messages():
    from ecs_ecommerce_data_pipeline_spark.protobuf_shim import (
        ensure_protobuf,
    )

    ensure_protobuf()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    cmd = sm.StateCallCommand()
    cmd.stateName = "agg"
    cmd.schema = '{"type":"struct"}'
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd),
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.version == 2
    assert back.WhichOneof("method") == "statefulProcessorCall"
    assert back.statefulProcessorCall.getValueState.stateName == "agg"

    # write-through presence: READING ttl must not serialize ttl {}
    c2 = sm.StateCallCommand()
    c2.stateName = "x"
    base = c2.SerializeToString()
    _ = c2.ttl
    assert c2.SerializeToString() == base
    c2.ttl.durationMs = 500
    b2 = sm.StateCallCommand()
    b2.ParseFromString(c2.SerializeToString())
    assert b2.HasField("ttl") and b2.ttl.durationMs == 500

    # repeated bytes + repeated message + enum + negative int64
    lp = sm.ListStatePut(value=[b"a", b"bb"], fetchWithArrow=False)
    l2 = sm.ListStatePut()
    l2.ParseFromString(lp.SerializeToString())
    assert list(l2.value) == [b"a", b"bb"]
    resp = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[sm.KeyAndValuePair(key=b"k", value=b"v")],
        requireNextFetch=True,
    )
    r2 = sm.StateResponseWithMapIterator()
    r2.ParseFromString(resp.SerializeToString())
    assert r2.kvPair[0].key == b"k" and r2.requireNextFetch is True
    s2 = sm.SetHandleState()
    s2.ParseFromString(
        sm.SetHandleState(state=sm.DATA_PROCESSED).SerializeToString()
    )
    assert s2.state == sm.DATA_PROCESSED == 3
    r3 = sm.RegisterTimer()
    r3.ParseFromString(
        sm.RegisterTimer(expiryTimestampMs=-5).SerializeToString()
    )
    assert r3.expiryTimestampMs == -5


def _kpi_fixture(spark):
    return spark.createDataFrame(
        [
            ("2024-03-01", "order", 7, 1000, 0),
            ("2024-03-01", "order", 7, 2500, 1),
            ("2024-03-01", "order", 9, 500, 0),
            ("2024-03-01", "item", None, 0, 0),
            ("2024-03-02", "item", None, 0, 0),
        ],
        KPI_ROWS_SCHEMA,
    )


def _run_daily(spark, tmp_path, name, rows_df):
    from ecs_ecommerce_data_pipeline_spark.streaming.stateful import (
        daily_kpi_running,
    )

    src = str(tmp_path / f"{name}_src")
    rows_df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(rows_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        daily_kpi_running(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final: dict[str, tuple] = {}
    best: dict[str, int] = {}
    for r in spark.sql(f"select * from {name}").collect():
        score = r["total_orders"] + r["total_items_sold"]
        if score >= best.get(r["date_key"], -1):
            best[r["date_key"]] = score
            final[r["date_key"]] = (
                r["total_orders"],
                r["total_revenue_cents"],
                r["total_items_sold"],
                r["returned_orders"],
                r["unique_customers"],
            )
    return final


def test_both_transports_execute_and_agree(spark, tmp_path, monkeypatch):
    from ecs_ecommerce_data_pipeline_spark.streaming import stateful as st

    assert st.HAS_TWS_PROTO, "vendored protobuf must activate the gate"
    rows = _kpi_fixture(spark)

    tws = _run_daily(spark, tmp_path, "tws_primary", rows)
    assert st.daily_kpi_running.api == "transformWithStateInPandas"

    monkeypatch.setattr(st, "HAS_TWS_PROTO", False)
    legacy = _run_daily(spark, tmp_path, "tws_fallback", rows)
    assert st.daily_kpi_running.api == "applyInPandasWithState"

    assert tws == legacy
    assert tws["2024-03-01"] == (3, 4000, 1, 1, 2)
    assert tws["2024-03-02"] == (0, 0, 1, 0, 0)


def test_topk_both_transports_agree(spark, tmp_path, monkeypatch):
    from pyspark.sql import functions as F  # noqa: F401

    from ecs_ecommerce_data_pipeline_spark.streaming import stateful as st

    rows = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 9.0), (1, 12, 7.0), (2, 20, 1.0)],
        "user_id long, event_id long, value double",
    )

    def run(name):
        src = str(tmp_path / f"{name}_src")
        rows.repartition(2).write.parquet(src)
        stream = (
            spark.readStream.schema(rows.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            st.user_topk_events(stream, k=2)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows_out = spark.sql(
            f"select * from {name}"
        ).collect()
        # update mode re-emits per touched batch: keep each user's last
        # leaderboard = the one containing the user's best value set
        final: dict[tuple, tuple] = {}
        for r in rows_out:
            final[(r["user_id"], r["rnk"])] = (r["event_id"], r["value"])
        return final

    tws = run("topk_tws")
    assert st.user_topk_events.api == "transformWithStateInPandas"
    monkeypatch.setattr(st, "HAS_TWS_PROTO", False)
    legacy = run("topk_legacy")
    assert st.user_topk_events.api == "applyInPandasWithState"
    assert tws == legacy
    assert tws[(1, 1)] == (11, 9.0)


def test_vendor_on_worker_pythonpath(spark):
    """The vendored runtime must resolve on forked Python workers too —
    otherwise the TWS worker dies at its first protobuf import."""
    vendor = os.path.join(
        os.path.dirname(
            os.path.abspath(
                __import__(
                    "ecs_ecommerce_data_pipeline_spark"
                ).__file__
            )
        ),
        "_vendor",
    )
    assert vendor in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def test_map_state_spend_both_transports_agree(spark, tmp_path, monkeypatch):
    """The MapState face (per-user category→totals map) — a state shape
    applyInPandasWithState never had natively; the vendored runtime's
    map-protocol messages (GetValue/UpdateValue/iterator
    KeyAndValuePair frames) execute against the real state server and
    the parallel-array fallback folds identically."""
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.streaming import stateful as st

    rows = spark.createDataFrame(
        [
            (1, "books", 500),
            (1, "games", 700),
            (1, "books", 300),
            (2, "books", 900),
            (1, "tools", 50),
            (2, "games", 20),
        ],
        "user_id long, category string, spend_cents bigint",
    )

    def run(name, full):
        src = str(tmp_path / f"{name}_src")
        rows.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(rows.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            st.user_category_spend_running(stream, emit_full_map=full)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        final: dict[tuple, tuple] = {}
        for r in spark.sql(f"select * from {name}").collect():
            k = (r["user_id"], r["category"])
            v = (r["orders"], r["spend_cents"])
            # update-mode re-emissions: running totals are monotone in
            # orders, so the max-orders row is the final state
            if k not in final or v[0] > final[k][0]:
                final[k] = v
        return final

    want = {
        (r["user_id"], r["category"]): (r["n"], r["cents"])
        for r in rows.groupBy("user_id", "category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("spend_cents").cast("long").alias("cents"),
        )
        .collect()
    }

    tws = run("spend_tws", False)
    assert st.user_category_spend_running.api == "transformWithStateInPandas"
    tws_full = run("spend_tws_full", True)
    monkeypatch.setattr(st, "HAS_TWS_PROTO", False)
    legacy = run("spend_legacy", False)
    assert st.user_category_spend_running.api == "applyInPandasWithState"

    assert tws == want
    assert tws_full == want
    assert legacy == want


def test_tws_timer_sessionizer_matches_stateful_twin(spark, tmp_path):
    """The TWS timer-API sessionizer (register/list/delete +
    handleExpiredTimer — protocol paths only the primary transport has)
    reproduces the applyInPandasWithState twin's sessions on the same
    multi-batch input, including the watermark-fired close."""
    import pandas as pd

    from ecs_ecommerce_data_pipeline_spark.streaming import stateful as st

    base = 1_700_000_000_000
    rows1 = [(1, base + 0), (1, base + 60_000), (2, base + 0)]
    rows2 = [
        (1, base + 120_000),
        (1, base + 2_000_000),
        (2, base + 3_000_000),
    ]

    def to_df(rows):
        return spark.createDataFrame(
            [
                (u, pd.Timestamp(ms, unit="ms").to_pydatetime())
                for u, ms in rows
            ],
            "user_id long, ts timestamp",
        )

    def run(name, fn):
        src = str(tmp_path / f"{name}_src")
        to_df(rows1).coalesce(1).write.mode("append").parquet(src)
        to_df(rows2).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "1 second")
        )
        q = (
            fn(stream, gap="10 minutes")
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        emitted = spark.sql(f"select * from {name}").toPandas()
        final = (
            emitted.sort_values(["n_events"])
            .groupby(["user_id", "session_start_ms"])
            .last()
            .reset_index()
        )
        sess = {
            (r.user_id, r.session_start_ms): (r.session_end_ms, r.n_events)
            for r in final.itertuples()
        }
        n_timer_closed = int(emitted["closed"].sum())
        return sess, n_timer_closed

    tws_sess, tws_closed = run("sess_tws", st.user_sessions_tws)
    assert st.user_sessions_tws.api == "transformWithStateInPandas"
    ref_sess, _ = run("sess_ref", st.user_sessions_stateful)

    assert tws_sess == ref_sess
    assert tws_sess[(1, base)] == (base + 120_000, 3)
    assert tws_sess[(1, base + 2_000_000)] == (base + 2_000_000, 1)
    # at least one session closed (split mid-stream or timer-fired)
    assert tws_closed >= 1


def test_vendored_runtime_property_roundtrip():
    """Property check: arbitrary field assignments on the real
    StateMessage types survive serialize→parse bit-exactly (values,
    presence, oneof selection) — the wire paths the JVM exercises."""
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    from ecs_ecommerce_data_pipeline_spark.protobuf_shim import (
        ensure_protobuf,
    )

    ensure_protobuf()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    i64 = st_.integers(min_value=-(2**63), max_value=2**63 - 1)
    i32 = st_.integers(min_value=-(2**31), max_value=2**31 - 1)
    bts = st_.binary(max_size=64)
    txt = st_.text(max_size=48)

    @settings(max_examples=200, deadline=None)
    @given(
        status=i32,
        err=txt,
        values=st_.lists(bts, max_size=6),
        more=st_.booleans(),
        ts=i64,
        name=txt,
        dur=i64,
    )
    def check(status, err, values, more, ts, name, dur):
        r = sm.StateResponseWithListGet(
            statusCode=status,
            errorMessage=err,
            value=values,
            requireNextFetch=more,
        )
        r2 = sm.StateResponseWithListGet()
        r2.ParseFromString(r.SerializeToString())
        assert r2.statusCode == status
        assert r2.errorMessage == err
        assert list(r2.value) == values
        assert r2.requireNextFetch == more

        t = sm.TimerInfo(key=b"k" if more else None, timestampMs=ts)
        t2 = sm.TimerInfo()
        t2.ParseFromString(t.SerializeToString())
        assert t2.timestampMs == ts
        # proto3 optional presence survives the round trip
        assert t2.HasField("key") == more

        c = sm.StateCallCommand()
        c.stateName = name
        if dur >= 0:
            c.ttl.durationMs = dur
        c2 = sm.StateCallCommand()
        c2.ParseFromString(c.SerializeToString())
        assert c2.stateName == name
        assert c2.HasField("ttl") == (dur >= 0)
        if dur >= 0:
            assert c2.ttl.durationMs == dur

    check()
