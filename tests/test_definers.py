"""S9 definer pipelines vs an independent pure-Python re-implementation
of the reference algorithms (definer_cities_id.py:29-91,
definer_metro_id.py:29-103) over the same synthetic web."""

from __future__ import annotations

import pytest

from cianparser_spark.corpus import webgen as W
from cianparser_spark.engine import definers


def _ref_define_cities(start: int, end: int) -> list[tuple[str, int]]:
    """Sequential reference semantics: ascending scan, set-based
    first-wins on name, final sort by name (definer_cities_id.py:
    56-72)."""
    seen, out = set(), []
    for rid in range(start, end + 1):
        title = definers.probe_city_title(rid, W.DEFAULT_CONFIG)
        if title is None:
            continue
        low = title.lower()
        i = low.find("снять квартиру в ")
        j = low.find(" на длительный срок")
        if i < 0 or j < 0:
            continue
        city = title[i + len("снять квартиру в "):j]
        if "в России" in title or "АрендаСнять" not in title:
            continue
        if any(s in city.lower() for s in definers.CITY_REJECT_SUBSTRINGS):
            continue
        if city and city not in seen:
            seen.add(city)
            out.append((city, rid))
    return sorted(out, key=lambda x: x[0])


def _ref_define_metro(start: int, end: int) -> list[tuple[str, str, int]]:
    seen, out = set(), []
    for mid in range(start, end + 1):
        addr = definers.probe_metro_address(mid, W.DEFAULT_CONFIG)
        if addr is None or ", м." not in addr:
            continue
        city = "Unknown"
        for name in definers.METRO_CITIES:  # if-chain: last match wins
            if name in addr:
                city = name
        metro = addr[addr.find(", м.") + len(", м. "):].split(", ")[0]
        if metro not in seen:
            seen.add(metro)
            out.append((city, metro, mid))
    return sorted(out, key=lambda x: x[0])


def test_cities_matches_reference_semantics(spark):
    got = [(r.location_name, r.city_id)
           for r in definers.define_cities(spark, 4690, 4790).collect()]
    want = _ref_define_cities(4690, 4790)
    assert got == want
    assert len(got) > 10  # the band is dense with real city ids


def test_cities_rejects_region_titles(spark):
    # a band with no city ids: only reject-flavor or headerless pages
    got = definers.define_cities(spark, 900000, 900200).collect()
    assert got == []


def test_city_probe_title_forms():
    assert definers.probe_city_title(4668, W.DEFAULT_CONFIG) == (
        "АрендаСнять квартиру в Барнаул на длительный срок")
    # unknown ids deterministically yield None or a reject flavor
    flavors = {definers.probe_city_title(i, W.DEFAULT_CONFIG)
               for i in range(900000, 900040)}
    assert None in flavors
    assert any(t and "области" in t for t in flavors)


def test_metro_matches_reference_semantics(spark):
    got = [(r.city, r.metro_name, r.metro_id)
           for r in definers.define_metro(spark, 1, 160).collect()]
    want = _ref_define_metro(1, 160)
    assert got == want
    # every discovered station is a real Moscow listing station
    assert {m for _, m, _ in got} <= set(W._METROS)
    assert all(c == "Москва" for c, _, _ in got)
    assert len(got) >= 3


def test_metro_first_wins_min_id(spark):
    rows = definers.define_metro(spark, 1, 160).collect()
    ids = {r.metro_name: r.metro_id for r in rows}
    # re-probing a wider range can only ADD stations, never change the
    # first-won id of an already-discovered one
    wider = {r.metro_name: r.metro_id
             for r in definers.define_metro(spark, 1, 200).collect()}
    for name, mid in ids.items():
        assert wider[name] == mid


def test_save_definer_csv_golden(spark, tmp_run_dir):
    df = definers.define_cities(spark, 4700, 4713)
    path = definers.save_definer_csv(df, tmp_run_dir, "cities_4700_4713.csv")
    want = "".join(f"{name},{rid}\n"
                   for name, rid in _ref_define_cities(4700, 4713))
    assert open(path, encoding="utf-8").read() == want
    assert path.endswith("cities_4700_4713.csv")


@pytest.mark.parametrize("city,rid", [("Москва", 1), ("Сочи", 4998)])
def test_probe_hits_known_city(city, rid):
    t = definers.probe_city_title(rid, W.DEFAULT_CONFIG)
    assert t is not None and city in t


def test_probe_faults_are_single_shot():
    """The reference definer's bare requests.get never retries
    (definer_cities_id.py:66-70): a deterministic transient 500 means
    that id is skipped this run — our kernel preserves that."""
    url = definers.CITY_PROBE_URL.format(id=5020)  # Тула: 500 at attempt 0
    assert W.status_for(url, 0) == 500
    assert definers.probe_city_title(5020, W.DEFAULT_CONFIG) is None
