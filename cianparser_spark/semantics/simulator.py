"""Sequential reference-semantics crawler — the engine's test oracle.

Re-implements the reference's single-threaded control flow verbatim
(reference: cianparser/cianparser.py:60-90 page loop + retry,
cianparser/flat/list.py:19-72 parse/dedup/append) over the synthetic
web, so the distributed engine's output can be bit-matched against it:
same rows, same crawl order, same seen-set, same stop behavior.

Documented deviations from the reference (SURVEY.md quirks appendix):
* a 200 page without the HeaderDefault div retries at most 3 times
  like exceptions do (the reference loops forever:
  cianparser/cianparser.py:73-75 never increments the counter);
* fetch attempts per URL are tracked explicitly so fault injection is
  a pure function of (url, n-th fetch) for both simulator and engine.

The running-average price keeps the reference's quirky recurrence
``(avg*n + p) / n`` with n already incremented
(reference: cianparser/base_list.py:43-47) for progress-metric parity;
true means come from the engine's metrics table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from cianparser_spark.corpus import webgen
from cianparser_spark.semantics import extract, robots, urls


@dataclass
class CrawlSeed:
    """One crawl query — the reference's constructor + method args."""

    seed_id: int
    location: str
    accommodation_type: str = "flat"  # flat | suburban | newobject
    deal_type: str = "sale"           # sale | rent_long | rent_short
    rooms: object = None
    suburban_type: str | None = None
    with_extra_data: bool = False
    additional_settings: dict | None = None

    def pages(self) -> tuple[int, int]:
        s = self.additional_settings or {}
        if self.accommodation_type == "newobject":
            # (reference: cianparser/newobject/list.py:27-28)
            return 1, 50
        # (reference: cianparser/base_list.py:27-28)
        return s.get("start_page", 1), s.get("end_page", 100)

    def url_template(self) -> str:
        from cianparser_spark.dims import location_id

        deal, rent_period = urls.rewrite_deal_type(self.deal_type)
        return urls.build_list_url_template(
            location_id(self.location),
            deal,
            self.accommodation_type,
            rooms=self.rooms if self.accommodation_type == "flat" else None,
            rent_period_type=rent_period,
            suburban_type=self.suburban_type if self.accommodation_type == "suburban" else None,
            additional_settings=self.additional_settings,
        )


@dataclass
class SimResult:
    rows: list[dict] = field(default_factory=list)
    order: list[tuple] = field(default_factory=list)  # (seed_id, page, card_idx) per row
    seen: set = field(default_factory=set)
    count_parsed_offers: int = 0
    cards_parsed: int = 0  # raw card blocks seen, pre-dedup (metrics parity)
    average_price: float = 0.0
    captcha_stopped: bool = False
    pages_fetched: int = 0
    detail_pages_fetched: int = 0
    failed_pages: list[tuple] = field(default_factory=list)
    robots_blocked: list[str] = field(default_factory=list)
    virtual_seconds: float = 0.0


MAX_ATTEMPTS = 3  # (reference: cianparser/cianparser.py:73)


def _project(row: dict, deal_type: str) -> dict:
    """Per-deal-type column pruning (reference: cianparser/base_list.py:58-86)."""
    drop: set = set()
    if deal_type == "sale":
        drop = extract.FIELDS_RENT_LONG | extract.FIELDS_RENT_SHORT
    elif deal_type == "rent_long":
        drop = extract.FIELDS_RENT_SHORT | extract.FIELDS_SALE
    elif deal_type == "rent_short":
        drop = extract.FIELDS_RENT_LONG | extract.FIELDS_SALE
    return {k: v for k, v in row.items() if k not in drop}


class ReferenceSimulator:
    """Runs seeds sequentially with the reference's exact semantics."""

    def __init__(self, cfg: webgen.WebConfig = webgen.DEFAULT_CONFIG, project_fields: bool = True,
                 respect_robots: bool = True):
        self.cfg = cfg
        self.project_fields = project_fields
        self.respect_robots = respect_robots
        self._fetch_counts: dict[str, int] = {}
        self._robots: dict[str, tuple] = {}

    def _allowed(self, url: str) -> bool:
        if not self.respect_robots:
            return True
        host = url.split("/")[2]
        if host not in self._robots:
            self._robots[host] = robots.parse_robots(webgen.robots_txt(host, self.cfg))
        return robots.is_allowed(url, self._robots[host])

    def _fetch(self, url: str) -> tuple[int, str]:
        n = self._fetch_counts.get(url, 0)
        self._fetch_counts[url] = n + 1
        return webgen.fetch(url, attempt=n, cfg=self.cfg)

    def run(self, seeds: list[CrawlSeed]) -> SimResult:
        res = SimResult()
        for seed in seeds:
            # each seed models ONE reference run (its own process, its
            # own requests session) — per-URL fetch-attempt counters
            # start fresh per run.  Leaking them across seeds made the
            # oracle diverge from both the reference and the engine
            # whenever two seeds shared URLs (fuzz seed 42 trial 9:
            # two identical newobject seeds under attempt-indexed
            # faults — the second seed's fetches started at advanced
            # attempts and skipped fault indices the reference would
            # hit).  The engine was already per-seed (frontier rows
            # carry their own attempt), so this fixes the SIMULATOR.
            self._fetch_counts = {}
            self._run_seed(seed, res)
        return res

    def _run_seed(self, seed: CrawlSeed, res: SimResult) -> None:
        template = seed.url_template()
        start_page, end_page = seed.pages()
        deal, _ = urls.rewrite_deal_type(seed.deal_type)
        kind = seed.accommodation_type
        is_sale = deal == "sale"

        page_number = start_page - 1
        end_all = False
        while page_number < end_page and not end_all:
            page_number += 1
            url = urls.format_page_url(template, page_number)
            if not self._allowed(url):
                res.robots_blocked.append(url)
                continue  # never fetched: no retry, no sleep, no attempt
            attempt = 0
            parsed = False
            while attempt < MAX_ATTEMPTS and not parsed:
                status, html = self._fetch(url)
                if status == 429:
                    res.virtual_seconds += 10.0
                    attempt += 1
                    continue
                if status != 200:
                    attempt += 1
                    continue
                if extract.has_captcha(html):
                    end_all = True
                    break
                if kind != "newobject" and not extract.has_header(html):
                    attempt += 1  # deviation: bounded instead of infinite
                    continue
                try:
                    self._parse_page(seed, html, page_number, deal, kind, is_sale, res)
                    parsed = True
                    res.pages_fetched += 1
                    # sleep(2) sits at the END of parse_list_offers_page,
                    # so only successful parses pay it (flat/list.py:41)
                    res.virtual_seconds += 2.0
                except _DetailFetchError:
                    attempt += 1
            if attempt >= MAX_ATTEMPTS and not parsed and not end_all:
                res.failed_pages.append((seed.seed_id, page_number))
        res.captcha_stopped = res.captcha_stopped or end_all

    def _parse_page(self, seed, html, page_number, deal, kind, is_sale, res) -> None:
        cards = extract.list_page_cards(html, kind)
        res.cards_parsed += len(cards)
        for idx, card in enumerate(cards):
            if kind == "newobject":
                self._parse_newobject(seed, card, page_number, idx, res)
            else:
                self._parse_offer(seed, card, page_number, idx, deal, kind, is_sale, res)

    def _detail(self, url: str, res: SimResult) -> str:
        status, html = self._fetch(url)
        if status == 429:
            res.virtual_seconds += 10.0
            raise _DetailFetchError(url)
        if status != 200:
            raise _DetailFetchError(url)
        res.detail_pages_fetched += 1
        res.virtual_seconds += 4.0  # sleep(4) after a successful detail parse
        return html

    def _parse_offer(self, seed, card, page_number, idx, deal, kind, is_sale, res) -> None:
        url = extract.card_url(card)
        # seen is PER SEED: each CrawlSeed models one reference
        # ``get_*`` call, and the reference's result_set is an instance
        # attribute of the parser built fresh per call
        # (base_list.py:24) — two seeds sharing a universe must each
        # emit the shared offers, exactly like two separate runs would
        key = (seed.seed_id, urls.deal_url_id(url))
        # dedup BEFORE the expensive detail fetch (flat/list.py:57-63)
        if key in res.seen:
            return

        common = {
            "url": url,
            "location": seed.location,
            "deal_type": deal,
            "accommodation_type": kind,
        }
        if kind == "suburban":
            common["suburban_type"] = seed.suburban_type

        author = extract.author(card)
        price = extract.price(card)
        if kind == "suburban":
            location = extract.location_suburban(card)
            spec: dict = {}
        else:
            location = extract.location_flat(card, is_sale)
            spec = extract.specification(card)

        page_data: dict = {}
        if seed.with_extra_data:
            if self._allowed(url):
                detail_html = self._detail(url, res)
            else:
                # blocked detail degrades to "enrichment from an empty
                # page": the reference extractor's own defaults
                res.robots_blocked.append(url)
                detail_html = ""
            page_data = (
                extract.detail_suburban(detail_html)
                if kind == "suburban"
                else extract.detail_flat(detail_html)
            )

        res.count_parsed_offers += 1
        # reference's quirky running average (base_list.py:43-47)
        p = price.get("price", price.get("price_per_month"))
        if p is not None:
            res.average_price = (
                res.average_price * res.count_parsed_offers + p
            ) / res.count_parsed_offers
        res.seen.add(key)
        # dict-union precedence (flat/list.py:69): right-most wins
        row = {**author, **common, **spec, **price, **page_data, **location}
        if self.project_fields:
            row = _project(row, seed.deal_type)
        res.rows.append(row)
        res.order.append((seed.seed_id, page_number, idx))

    def _parse_newobject(self, seed, card, page_number, idx, res) -> None:
        common = extract.parse_newobject_card(card)
        common = {
            "name": common["name"],
            "location": seed.location,
            "accommodation_type": "newobject",
            "url": common["url"],
            "full_full_location_address": common["full_full_location_address"],
        }
        # dedup key = scheme+host (newobject/list.py:71,74), per seed
        # (fresh result_set per reference run — see _parse_offer)
        if (seed.seed_id, common["url"]) in res.seen:
            return
        # detail fetch is unconditional for newobjects (newobject/list.py:77-79)
        durl = common["url"] + "/"
        if self._allowed(durl):
            detail_html = self._detail(durl, res)
        else:
            res.robots_blocked.append(durl)
            detail_html = ""
        page_data = extract.detail_newobject(detail_html)
        res.count_parsed_offers += 1
        res.seen.add((seed.seed_id, common["url"]))
        res.rows.append({**common, **page_data})
        res.order.append((seed.seed_id, page_number, idx))


class _DetailFetchError(Exception):
    pass
