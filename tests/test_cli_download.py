"""CLI parsing + S7 download-utility semantics (fake client)."""

import pytest

from gedixr_spark.cli import build_parser, parse_beams, parse_variables
from gedixr_spark.sources.download import (
    CHECKPOINT_NAME,
    FakeHarmonyClient,
    bbox_from_vector,
    download_data,
)


def test_parse_variables_spec():
    # reference cli.py:93-105 format
    assert parse_variables("rh98=rh98,tcc=cover") == [("rh98", "rh98"), ("tcc", "cover")]
    assert parse_variables(None) is None
    with pytest.raises(ValueError):
        parse_variables("not_a_pair")


def test_parse_beams_spec():
    assert parse_beams("power") == "power"
    assert parse_beams("BEAM0000,BEAM0101") == ["BEAM0000", "BEAM0101"]
    assert parse_beams(None) is None


def test_parser_accepts_reference_flags():
    args = build_parser().parse_args(
        ["extract", "/data", "--gedi-product", "L2A", "--filter-month", "6", "8",
         "--subset-vector", "a.geojson", "--subset-vector", "b.geojson"]
    )
    assert args.filter_month == [6, 8]
    assert args.subset_vector == ["a.geojson", "b.geojson"]


def test_bbox_from_wkt():
    assert bbox_from_vector("POLYGON ((0 1, 2 1, 2 3, 0 3, 0 1))") == (0, 1, 2, 3)


def test_bbox_from_wkt_multipolygon_and_holes():
    # bbox spans all parts; interior rings never widen it
    assert bbox_from_vector(
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 6 5, 6 7, 5 7, 5 5)))"
    ) == (0, 0, 6, 7)
    assert bbox_from_vector(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    ) == (0, 0, 4, 4)


def test_bbox_from_geojson_multipolygon(tmp_path):
    import json

    path = tmp_path / "aoi.geojson"
    path.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [[[0, 0], [3, 0], [3, 1], [0, 1], [0, 0]]],
                    [[[-2, 4], [1, 4], [1, 6], [-2, 6], [-2, 4]]],
                ],
            },
        }],
    }))
    assert bbox_from_vector(str(path)) == (-2, 0, 3, 6)


def test_download_submits_and_checkpoints(tmp_path):
    client = FakeHarmonyClient(granules=["GEDI02_B_x_V002.h5"])
    paths, job_id = download_data(
        tmp_path, "L2B", subset_bbox=(0, 0, 1, 1), client=client
    )
    assert [p.name for p in paths] == ["GEDI02_B_x_V002.h5"]
    assert client.submitted[0]["collection"] == "GEDI02_B"
    # checkpoint removed after success (download.py:156-157)
    assert not (tmp_path / CHECKPOINT_NAME).exists()


def test_download_resumes_from_checkpoint(tmp_path):
    (tmp_path / CHECKPOINT_NAME).write_text("job-42")
    client = FakeHarmonyClient(granules=["g.h5"])
    paths, job_id = download_data(tmp_path, "L2B", client=client)
    assert job_id == "job-42"
    assert client.submitted == []  # no new submission — resumed


def test_download_warns_on_failures(tmp_path):
    client = FakeHarmonyClient(granules=["g.h5"], failed=["bad.h5"])
    with pytest.warns(UserWarning, match="1 granules failed"):
        download_data(tmp_path, "L2A", subset_bbox=(0, 0, 1, 1), client=client)


def test_download_rejects_bad_product(tmp_path):
    with pytest.raises(ValueError):
        download_data(tmp_path, "L9Z", client=FakeHarmonyClient())


def test_cli_profile_card_compact_vacuum(spark, tmp_path, capsys):
    """The pipeline-ops subcommands end-to-end through main()."""
    import json as _json

    from gedixr_spark.cli import main

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"doc text {i}", "en") for i in range(20)],
        "doc_id long, text string, lang string",
    ).repartition(6).write.parquet(path)

    assert main(["profile", path]) == 0
    prof = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["column"] for r in prof} == {"doc_id", "text", "lang"}

    assert main(["card", path]) == 0
    card = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert card["n_docs"] == 20 and card["langs"] == {"en": 20}

    assert main(["compact", path, "--target-mb", "128"]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["before"]["n_files"] == 6 and res["after"]["n_files"] == 1

    assert main(["vacuum", path]) == 0
    vac = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert vac == {"removed": []}


def test_cli_versioned_table_commands(spark, tmp_path, capsys):
    import json as _json

    from pyspark.sql import Row

    from gedixr_spark.cli import main
    from gedixr_spark.sinks.versioned import (
        commit_append, commit_overwrite, init_versioned, read_versioned,
    )

    table = str(tmp_path / "vt")
    init_versioned(spark, table)
    commit_append(spark, table, spark.createDataFrame([Row(k=1, v="a")]))
    commit_overwrite(spark, table, spark.createDataFrame([Row(k=9, v="z")]))

    assert main(["history", table]) == 0
    hist = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [e["op"] for e in hist] == ["create", "append", "overwrite"]

    assert main(["rollback", table, "--to-version", "1"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["meta"]["restored_version"] == 1
    assert [(r["k"], r["v"]) for r in read_versioned(spark, table).collect()] == [
        (1, "a")
    ]

    # default retention (7 days) keeps the fresh files: dry list empty
    assert main(["tvacuum", table, "--keep-last", "1"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deleted"] == []
    # explicit zero retention (single-writer maintenance): files go
    assert main(
        ["tvacuum", table, "--keep-last", "1", "--retention-hours", "0"]
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deleted"]  # the overwritten version's file aged out
