"""Runtime shuffle-volume introspection.

Plan gates (``tests/test_plans.py``) prove a plan's SHAPE — broadcast
here, no Exchange there. This module proves the plan's VOLUME: how many
bytes actually crossed a shuffle boundary, read from the Spark UI's REST
API after running the job under a dedicated job group. That turns scale
claims like "exact dedup shuffles 16-byte hashes + ids, never the text"
into measured assertions (see ``tests/test_shuffle_volume.py``).

Local-only concerns: the UI runs in-process (``sc.uiWebUrl``); on a real
cluster the same API lives on the driver/history server.
"""

from __future__ import annotations

import json
import urllib.request
import uuid
from collections.abc import Callable

from pyspark.sql import SparkSession


def _get_json(url: str):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.load(resp)


def job_shuffle_write_bytes(spark: SparkSession, action: Callable[[], None]) -> int:
    """Run ``action`` under a fresh job group and return the total
    shuffle WRITE bytes of every stage its jobs executed.

    Returns -1 if the UI REST API is unavailable (UI disabled) — callers
    (tests) should skip rather than fail.
    """
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    if not ui:
        return -1
    group = f"introspect-{uuid.uuid4().hex[:12]}"
    sc.setJobGroup(group, "shuffle-volume probe")
    try:
        action()
    finally:
        sc.setJobGroup(None, None)  # type: ignore[arg-type]

    app_id = sc.applicationId
    try:
        jobs = _get_json(f"{ui}/api/v1/applications/{app_id}/jobs")
        stage_ids: set[int] = set()
        for j in jobs:
            if j.get("jobGroup") == group:
                stage_ids.update(j.get("stageIds", []))
        if not stage_ids:
            return -1
        total = 0
        stages = _get_json(f"{ui}/api/v1/applications/{app_id}/stages")
        seen: set[int] = set()
        for s in stages:
            sid = s.get("stageId")
            if sid in stage_ids and sid not in seen:
                seen.add(sid)  # first entry per stage = latest attempt
                total += int(s.get("shuffleWriteBytes", 0))
        return total
    except Exception:
        return -1
