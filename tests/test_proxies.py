"""Proxy pool (S4) semantics vs the reference algorithm
(cianparser/proxy_pool.py:9-61) and its engine integration."""

from __future__ import annotations

import dataclasses

from cianparser_spark.corpus import webgen as W
from cianparser_spark.engine.proxies import ProxyPool

URL = "https://cian.ru/cat.php?engine_version=2&p=1&region=1&deal_type=sale&offer_type=flat"


def _pool(cfg):
    return ProxyPool(cfg.proxies, lambda u, p: W.probe_proxy(u, p, cfg))


def test_first_healthy_wins_and_failures_drop():
    cfg = dataclasses.replace(
        W.DEFAULT_CONFIG,
        proxies=("p-dead", "p-captcha", "p-ok", "p-ok2"),
        proxy_unavailable=frozenset({"p-dead"}),
        proxy_captcha=frozenset({"p-captcha"}),
    )
    pool = _pool(cfg)
    assert not pool.is_empty()
    assert pool.get_available_proxy(URL) == "p-ok"
    # the two failing candidates were removed permanently
    assert pool.dropped == ["p-dead", "p-captcha"]
    assert pool.n_probes == 3
    # re-resolution (the reference re-probes per page) is stable and
    # probes only the surviving head
    assert pool.get_available_proxy(URL) == "p-ok"
    assert pool.n_probes == 4


def test_exhausted_pool_returns_none():
    cfg = dataclasses.replace(
        W.DEFAULT_CONFIG,
        proxies=("a", "b"),
        proxy_unavailable=frozenset({"a"}),
        proxy_captcha=frozenset({"b"}),
    )
    pool = _pool(cfg)
    assert pool.get_available_proxy(URL) is None
    assert pool.is_empty()
    assert pool.dropped == ["a", "b"]


def test_empty_pool_is_noop():
    pool = _pool(W.DEFAULT_CONFIG)
    assert pool.is_empty()
    assert pool.get_available_proxy(URL) is None
    assert pool.n_probes == 0


def test_reference_loop_equivalence():
    """Deterministic-order pool == the reference's probe loop run with
    the same candidate order (random.choice replaced by head-of-list,
    the documented deviation)."""
    cfg = dataclasses.replace(
        W.DEFAULT_CONFIG,
        proxies=("x1", "x2", "x3", "x4"),
        proxy_unavailable=frozenset({"x1", "x3"}),
        proxy_captcha=frozenset({"x2"}),
    )

    # reference semantics, sequential (proxy_pool.py:35-61)
    ref_pool = list(cfg.proxies)
    ref_current = None
    while ref_pool and ref_current is None:
        cand = ref_pool[0]
        available, captcha = W.probe_proxy(URL, cand, cfg)
        if not available or captcha:
            ref_pool.remove(cand)
            continue
        ref_current = cand

    pool = _pool(cfg)
    assert pool.get_available_proxy(URL) == ref_current == "x4"


def test_fetch_through_working_proxy_is_transparent(spark, tmp_run_dir):
    """A crawl with a (partially unhealthy) proxy pool produces rows
    bit-identical to the simulator — proxies affect rotation
    bookkeeping, never content (like the real site)."""
    from cianparser_spark.engine.facade import CianParser
    from cianparser_spark.semantics.simulator import CrawlSeed, ReferenceSimulator

    cfg = dataclasses.replace(
        W.DEFAULT_CONFIG,
        proxies=("bad1", "cap1", "ok-proxy"),
        proxy_unavailable=frozenset({"bad1"}),
        proxy_captcha=frozenset({"cap1"}),
    )
    rows = CianParser("Казань", spark=spark, web_cfg=cfg, host_tokens=4).get_flats(
        deal_type="sale", rooms=(1,),
        additional_settings={"start_page": 1, "end_page": 2})
    sim = ReferenceSimulator(cfg).run(
        [CrawlSeed(1, "Казань", "flat", "sale", rooms=(1,),
                   additional_settings={"start_page": 1, "end_page": 2})])
    assert rows == sim.rows
    assert len(rows) > 0
