"""CLI surface (python -m ecs_ecommerce_data_pipeline_spark ...)."""

from __future__ import annotations

import json

from ecs_ecommerce_data_pipeline_spark.__main__ import main


def test_cli_list_names_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    names = {line.split("\t")[0] for line in out}
    from ecs_ecommerce_data_pipeline_spark import catalog

    assert names == set(catalog.queries())
    assert all(line.split("\t")[1] in ("oracle", "rows-only") for line in out)


def test_cli_oracle_prints_sql(capsys):
    assert main(["oracle", "daily_kpis"]) == 0
    assert "SELECT" in capsys.readouterr().out.upper()
    assert main(["oracle", "nope"]) == 1


def test_cli_run_emits_json_lines(spark, capsys):
    # reuses the session fixture's JVM; the CLI builds/reuses via getOrCreate
    assert (
        main(["run", "events_funnel", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    )
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert len(lines) == 1 and "n_full_funnel" in lines[0]
