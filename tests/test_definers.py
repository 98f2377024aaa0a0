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


# --------------------------- pymorphy2 stand-in (semantics/morphru.py)

def test_morphru_hand_checked_forms():
    """Lock a hand-verified sample of real Russian prepositional
    forms — a declension-rule regression must fail loudly here, not
    inside an oracle diff."""
    from cianparser_spark.semantics import morphru

    expected = {
        "Москва": "Москве",
        "Казань": "Казани",
        "Санкт-Петербург": "Санкт-Петербурге",
        "Нижний Новгород": "Нижнем Новгороде",
        "Великий Новгород": "Великом Новгороде",
        "Набережные Челны": "Набережных Челнах",
        "Ростов-на-Дону": "Ростове-на-Дону",
        "Петропавловск-Камчатский": "Петропавловске-Камчатском",
        "Ярославль": "Ярославле",
        "Ставрополь": "Ставрополе",
        "Пермь": "Перми",
        "Тверь": "Твери",
        "Орёл": "Орле",
        "Череповец": "Череповце",
        "Электросталь": "Электростали",
        "Анадырь": "Анадыре",
        "Сочи": "Сочи",
        "Тольятти": "Тольятти",
        "Улан-Удэ": "Улан-Удэ",
        "Грозный": "Грозном",
        "Видное": "Видном",
        "Люберцы": "Люберцах",
        "Химки": "Химках",
        "Мытищи": "Мытищах",
        "Кемерово": "Кемерове",
        "Йошкар-Ола": "Йошкар-Оле",
        "Аксай": "Аксае",
        "Новосибирск": "Новосибирске",
    }
    for nom, prep in expected.items():
        assert morphru.prepositional_form(nom) == prep, nom


def test_morphru_vocabulary_roundtrip():
    """Every vocabulary city's generated form maps back to exactly its
    own nominative, and nominative identity entries survive collisions
    — the two invariants the definer's normalization relies on."""
    from cianparser_spark.semantics import morphru

    vocab = morphru.default_vocab()
    assert len(vocab) == 156
    for c in vocab:
        assert morphru.normal_form_city(morphru.prepositional_form(c)) == c
        assert morphru.normal_form_city(c) == c  # identity on nominative


def test_definer_inflected_titles_normalize(spark):
    """End-to-end: prepositional-rendering site → definer pipeline →
    nominative output identical to the nominative-rendering run (the
    reference's normal_form contract)."""
    import dataclasses

    from cianparser_spark.corpus import webgen
    from cianparser_spark.engine import definers

    cfg_nom = webgen.DEFAULT_CONFIG
    cfg_inf = dataclasses.replace(cfg_nom, inflect_city_headers=True)
    nom = definers.define_cities(spark, 4630, 4700, cfg=cfg_nom).collect()
    inf = definers.define_cities(spark, 4630, 4700, cfg=cfg_inf).collect()
    assert [tuple(r) for r in nom] == [tuple(r) for r in inf]
    assert len(nom) > 5
    # sanity: the inflected site really serves inflected titles
    t = definers.probe_city_title(4671, cfg_inf)  # Казань's id band
    t_nom = definers.probe_city_title(4671, cfg_nom)
    assert t != t_nom
