"""The reference-shaped experiment CLI (speed/query/kconnect/census)."""

from __future__ import annotations

import json


def test_census_experiment_cli(capsys):
    from landscape_spark.experiments import main

    main(["census", "--n", "256", "--seeds", "2"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["experiment"] == "census"
    assert all(r["attempts"] > 0 for r in rec["results"])


def test_speed_experiment_cli(spark, capsys):
    """speed at toy scale: the CLI reuses the live session via getOrCreate,
    so this exercises the full ingest + CC query path in-process."""
    from landscape_spark.experiments import main

    main(["speed", "--n", "256", "--m", "8192", "--reps", "1", "--cpus", "4"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["experiment"] == "speed"
    assert rec["ins_per_sec"] > 0 and rec["n_components"] >= 1
