"""API facade: reference-compatible surface and CSV sink."""

import csv
import dataclasses
import os

import pytest

import cianparser_spark as cp
from cianparser_spark.corpus import webgen as W
from cianparser_spark.semantics.simulator import CrawlSeed, ReferenceSimulator

CFG = dataclasses.replace(W.DEFAULT_CONFIG, faults_on_details=False,
                          universe_base=60, universe_span=30)


def test_public_surface():
    assert cp.list_locations()[0] == ["Москва", "1"]
    assert "Московский" in cp.list_metro_stations()
    assert cp.CITIES["Москва"] == "1"


def test_unknown_location_raises(spark):
    with pytest.raises(ValueError):
        cp.CianParser("Хогвартс", spark=spark)


def test_get_flats_matches_oracle(spark, tmp_run_dir, tmp_path):
    parser = cp.CianParser("Москва", spark=spark, web_cfg=CFG,
                           run_dir=tmp_run_dir, output_dir=str(tmp_path))
    rows = parser.get_flats(deal_type="sale", rooms=1, with_saving_csv=True,
                            additional_settings={"end_page": 2})
    sim_seed = CrawlSeed(1, "Москва", "flat", "sale", rooms=1,
                         additional_settings={"end_page": 2})
    sim = ReferenceSimulator(CFG).run([sim_seed])
    assert rows == sim.rows
    csvs = [f for f in os.listdir(tmp_path) if f.endswith(".csv")]
    assert len(csvs) == 1 and csvs[0].startswith("cian_flat_sale_1_2_moskva")
    with open(tmp_path / csvs[0], newline="", encoding="utf-8") as fh:
        got = list(csv.DictReader(fh, delimiter=";"))
    assert len(got) == len(rows)
    assert got[0]["url"] == rows[0]["url"]
    # reference sentinel convention survives the sink
    assert set(got[0].keys()) == set(rows[0].keys())


def test_get_flats_validation(spark, tmp_run_dir):
    parser = cp.CianParser("Москва", spark=spark, web_cfg=CFG, run_dir=tmp_run_dir)
    with pytest.raises(ValueError):
        parser.get_flats(deal_type="lease", rooms=1)
    with pytest.raises(ValueError):
        parser.get_flats(deal_type="sale", rooms=17)
