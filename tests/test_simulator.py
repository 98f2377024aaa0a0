"""Sequential oracle behavior: dedup, captcha, retries, averages."""

import dataclasses

from cianparser_spark.corpus import webgen as W
from cianparser_spark.semantics import urls
from cianparser_spark.semantics.simulator import CrawlSeed, ReferenceSimulator

NO_FAULTS = dataclasses.replace(
    W.DEFAULT_CONFIG, fail_500_mod=10**9, fail_429_mod=10**9
)


def test_first_wins_dedup_within_run():
    seed = CrawlSeed(1, "Москва", "flat", "sale", rooms=1,
                     additional_settings={"end_page": 3})
    res = ReferenceSimulator(NO_FAULTS).run([seed])
    ids = [urls.deal_url_id(r["url"]) for r in res.rows]
    assert len(ids) == len(set(ids))
    # injected adjacent-page dups mean fewer rows than raw card count
    tpl = seed.url_template()
    raw = sum(len(W.page_oids(urls.format_page_url(tpl, p))) for p in (1, 2, 3))
    assert len(ids) < raw


def test_captcha_stops_run():
    seed = CrawlSeed(1, "Москва", "flat", "sale", rooms=2,
                     additional_settings={"end_page": 5})
    tpl = seed.url_template()
    cfg = dataclasses.replace(
        NO_FAULTS, captcha_pages=frozenset({urls.format_page_url(tpl, 2)})
    )
    res = ReferenceSimulator(cfg).run([seed])
    assert res.captcha_stopped
    assert res.pages_fetched == 1
    assert all(o == (1, 1) or o[1] == 1 for o in res.order)


def test_retry_consumes_three_attempts_then_skips():
    seed = CrawlSeed(1, "Москва", "flat", "sale", rooms=(1, 2, 3),
                     additional_settings={"end_page": 6})
    # default config: some list URLs 500 on attempts 0-1 and recover at 2;
    # with dead_mod set, some die permanently
    cfg = dataclasses.replace(W.DEFAULT_CONFIG, dead_mod=11)
    res = ReferenceSimulator(cfg).run([seed])
    tpl = seed.url_template()
    dead = [
        p for p in range(1, 7)
        if W.status_for(urls.format_page_url(tpl, p), 99, cfg) == 500
    ]
    assert {p for _, p in res.failed_pages} == set(dead)
    fetched_pages = {o[1] for o in res.order}
    assert fetched_pages.isdisjoint(dead)


def test_quirky_running_average_preserved():
    # (avg*n + p)/n with n ALREADY incremented over-weights history
    # (reference: cianparser/base_list.py:43-47) — assert the exact fold
    seed = CrawlSeed(1, "Москва", "flat", "sale", rooms=1,
                     additional_settings={"end_page": 1})
    res = ReferenceSimulator(NO_FAULTS).run([seed])
    avg, n = 0.0, 0
    for r in res.rows:
        n += 1
        avg = (avg * n + r["price"]) / n
    assert abs(res.average_price - avg) < 1e-9


def test_projection_per_deal_type():
    seeds = [
        CrawlSeed(1, "Москва", "flat", "sale", rooms=1, additional_settings={"end_page": 1}),
        CrawlSeed(2, "Москва", "flat", "rent_long", rooms=1, additional_settings={"end_page": 1}),
    ]
    res = ReferenceSimulator(NO_FAULTS).run(seeds)
    sale = [r for r in res.rows if r["deal_type"] == "sale"]
    rent = [r for r in res.rows if r["deal_type"] == "rent"]
    assert sale and rent
    for r in sale:
        assert "price_per_month" not in r and "commissions" not in r
        assert "price" in r and "residential_complex" in r
    for r in rent:
        assert "price" not in r and "residential_complex" not in r
        assert "price_per_month" in r and "commissions" in r


def test_newobject_detail_always_fetched():
    seed = CrawlSeed(1, "Москва", "newobject")
    cfg = dataclasses.replace(NO_FAULTS, universe_base=40, universe_span=1)
    res = ReferenceSimulator(cfg).run([seed])
    assert res.detail_pages_fetched == len(res.rows) > 0
    for r in res.rows:
        assert r["url"].startswith("https://zhk-")
        assert "year_of_construction" in r and "builder" in r
