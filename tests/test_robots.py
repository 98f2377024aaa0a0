"""robots.txt gating: parser semantics + engine-vs-simulator bit-match
with list-page and detail-page Disallow rules (north-rule requirement;
the reference has NO robots handling — these semantics are ours and are
applied identically by both worlds, see semantics/robots.py)."""

import dataclasses

import pytest
from pyspark.sql import functions as F

from cianparser_spark.corpus import webgen as W
from cianparser_spark.engine import compat
from cianparser_spark.engine.crawler import CrawlEngine
from cianparser_spark.semantics import robots
from cianparser_spark.semantics.simulator import CrawlSeed, ReferenceSimulator

BASE_CFG = dataclasses.replace(W.DEFAULT_CONFIG, faults_on_details=False)


def test_parse_robots_subset():
    txt = (
        "# comment\nUser-agent: Googlebot\nDisallow: /google-only\n\n"
        "User-agent: *\nDisallow: /sale/flat/\nDisallow: /cat.php?engine_version=2&p=2&\n"
    )
    rules = robots.parse_robots(txt)
    assert rules == ("/sale/flat/", "/cat.php?engine_version=2&p=2&")
    assert not robots.is_allowed("https://h.ru/sale/flat/123/", rules)
    assert robots.is_allowed("https://h.ru/rent/flat/123/", rules)
    assert robots.is_allowed("https://h.ru/x", ())
    # allow-all robots.txt (empty Disallow value) parses to no rules
    assert robots.parse_robots(W.robots_txt("h.ru", BASE_CFG)) == ()


@pytest.mark.parametrize("seed", range(3))
def test_robots_roundtrip_property(seed):
    """webgen serves rules → parser recovers them exactly → is_allowed
    agrees with a naive prefix check, for randomized rule/url sets."""
    import random

    rng = random.Random(seed)
    alphabet = ["/sale/", "/rent/", "/cat.php?", "/flat/", "/x", "/y/z"]
    rules = tuple(rng.choice(alphabet) + str(rng.randrange(10))
                  for _ in range(rng.randrange(1, 5)))
    cfg = dataclasses.replace(BASE_CFG, robots_disallow=rules)
    parsed = robots.parse_robots(W.robots_txt("h.ru", cfg))
    assert parsed == rules
    for _ in range(50):
        path = rng.choice(alphabet) + str(rng.randrange(12))
        url = "https://h.ru" + path
        naive = not any(path.startswith(r) for r in rules)
        assert robots.is_allowed(url, parsed) == naive


def test_engine_bitmatch_blocked_list_page(spark, tmp_run_dir):
    """Disallow exactly page 2 of every query: both worlds skip it
    without retries; the engine dead-letters it as robots-list."""
    cfg = dataclasses.replace(
        BASE_CFG, robots_disallow=("/cat.php?engine_version=2&p=2&",)
    )
    seed = CrawlSeed(1, "Москва", "flat", "sale", rooms="all",
                     additional_settings={"end_page": 3})
    sim = ReferenceSimulator(cfg).run([seed])
    assert sim.robots_blocked, "config must actually block a page"
    eng = CrawlEngine(spark, tmp_run_dir, [seed], cfg, host_tokens=4)
    rows = compat.to_reference_rows(eng.run(), [seed])
    assert rows == sim.rows
    dead = eng.store.read("dead").collect()
    assert {r["kind"] for r in dead} == {"robots-list"}
    assert {int(r["page_number"]) for r in dead} == {2}
    # page 2 was never fetched
    fetched = eng.store.read("metrics").agg(F.sum("pages_fetched")).collect()[0][0]
    assert fetched == sim.pages_fetched


def test_engine_bitmatch_blocked_details_degrade(spark, tmp_run_dir):
    """Disallow the flat detail subtree: offers still emit from card
    fields, without enrichment, identically in both worlds."""
    cfg = dataclasses.replace(
        BASE_CFG, universe_base=40, universe_span=20,
        robots_disallow=("/sale/flat/",),
    )
    seed = CrawlSeed(1, "Москва", "flat", "sale", rooms=1, with_extra_data=True,
                     additional_settings={"end_page": 2})
    sim = ReferenceSimulator(cfg).run([seed])
    assert sim.robots_blocked and sim.detail_pages_fetched == 0
    eng = CrawlEngine(spark, tmp_run_dir, [seed], cfg, host_tokens=64)
    rows = compat.to_reference_rows(eng.run(), [seed])
    assert rows == sim.rows
    assert len(rows) > 0
    # no detail enrichment happened: detail-only field keeps its sentinel
    assert all(r.get("year_of_construction", -1) == -1 for r in rows)


def test_respect_robots_false_ignores_rules(spark, tmp_run_dir):
    cfg = dataclasses.replace(
        BASE_CFG, robots_disallow=("/cat.php",)  # blocks every list page
    )
    seed = CrawlSeed(1, "Москва", "flat", "sale", rooms=1,
                     additional_settings={"end_page": 2})
    sim = ReferenceSimulator(cfg, respect_robots=False).run([seed])
    eng = CrawlEngine(spark, tmp_run_dir, [seed], cfg, host_tokens=4,
                      respect_robots=False)
    rows = compat.to_reference_rows(eng.run(), [seed])
    assert rows == sim.rows and len(rows) > 0


def test_blocked_everything_yields_empty_run(spark, tmp_run_dir):
    cfg = dataclasses.replace(BASE_CFG, robots_disallow=("/cat.php",))
    seed = CrawlSeed(1, "Москва", "flat", "sale", rooms=1,
                     additional_settings={"end_page": 2})
    sim = ReferenceSimulator(cfg).run([seed])
    eng = CrawlEngine(spark, tmp_run_dir, [seed], cfg, host_tokens=4)
    offers = eng.run()
    assert offers.count() == 0 and sim.rows == []
    assert eng.store.read("dead").filter(F.col("kind") == "robots-list").count() == 2
