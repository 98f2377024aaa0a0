"""Sweep fault configs in the SEQUENTIAL simulator (no Spark) looking
for crawls that exercise the detail-fault coupling's hardest paths:

- a page death from detail-budget exhaustion (failed_pages);
- a key with ≥2 occurrences whose FIRST occurrence's page died and a
  later duplicate emitted it (cross-page resurrection);
- ideally ≥3 occurrences of one key spread over ≥3 pages, so the
  engine's parked-placeholder ordering (earliest duplicate claims the
  resurrection, not the newest) is observable.

Prints candidate configs as JSON lines; used to pick the pinned
configs in tests/test_detail_faults.py.
"""

import dataclasses
import itertools
import json

from cianparser_spark.corpus import webgen as W
from cianparser_spark.semantics import extract, urls
from cianparser_spark.semantics.simulator import CrawlSeed, ReferenceSimulator


def probe(cfg, seed):
    sim = ReferenceSimulator(cfg)
    occ = []  # (page, idx, key) for every card occurrence walked
    orig = sim._parse_page

    def patched(html, page_number, deal, kind, is_sale, res):
        cards = extract.list_page_cards(html, kind)
        for i, c in enumerate(cards):
            if kind == "newobject":
                k = extract.parse_newobject_card(c)["url"]
            else:
                k = urls.deal_url_id(extract.card_url(c))
            occ.append((page_number, i, k))
        return orig(seed, html, page_number, deal, kind, is_sale, res)

    sim._parse_page = lambda s, html, pn, d, kd, isale, res: patched(
        html, pn, d, kd, isale, res)
    res = sim.run([seed])
    failed = {p for _, p in res.failed_pages}
    first_page = {}
    pages_of = {}
    for (p, i, k) in occ:
        first_page.setdefault(k, p)
        pages_of.setdefault(k, set()).add(p)
    emitted_page = {}
    for (sid, p, i), row in zip(res.order, res.rows):
        k = (row["url"] if seed.accommodation_type == "newobject"
             else urls.deal_url_id(row["url"]))
        emitted_page.setdefault(k, p)
    resurrected = [k for k, fp in first_page.items()
                   if fp in failed and emitted_page.get(k, fp) != fp]
    triple = [k for k in resurrected if len(pages_of[k]) >= 3]
    return res, resurrected, triple


def main():
    for ub, f5, f9, dead, ep, dup in itertools.product(
            (40, 60), (11, 17, 37), (13, 41), (0, 23), (10, 14, 20), (0,)):
        cfg = dataclasses.replace(
            W.DEFAULT_CONFIG, universe_base=ub, universe_span=30,
            fail_500_mod=f5, fail_429_mod=f9, dead_mod=dead)
        seed = CrawlSeed(1, "Москва", "flat", "sale", rooms="all",
                         with_extra_data=True,
                         additional_settings={"end_page": ep})
        try:
            res, resur, triple = probe(cfg, seed)
        except Exception:
            continue
        if res.failed_pages and resur:
            print(json.dumps({
                "universe_base": ub, "fail_500_mod": f5, "fail_429_mod": f9,
                "dead_mod": dead, "end_page": ep, "rows": len(res.rows),
                "failed_pages": sorted(res.failed_pages),
                "n_resurrected": len(resur), "n_triple": len(triple)}))


if __name__ == "__main__":
    main()
