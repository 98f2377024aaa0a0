"""Dimension tables: locations and metro stations.

The reference ships these as large literal lists harvested from the
target site (reference: cianparser/constants.py:69-231 CITIES — 156
pairs; :233-758 METRO_STATIONS — 7 networks / 510 stations).  They are
*data*, not logic.  We keep a representative curated subset inline
(enough for every test path: lookups, broadcast joins, unknown-location
errors) and expose loaders so a deployment can drop in the full tables
as CSV without code changes.

Spark usage: both tables are tiny (≤ hundreds of rows) → always the
build side of a broadcast hash join, or a plain driver-side dict.
"""

from __future__ import annotations

# location name -> region id (string, as the site URL expects).
CITIES: dict[str, str] = {
    "Москва": "1",
    "Санкт-Петербург": "2",
    "Екатеринбург": "4743",
    "Новосибирск": "4897",
    "Казань": "4777",
    "Нижний Новгород": "4885",
    "Челябинск": "5048",
    "Омск": "4914",
    "Самара": "4966",
    "Ростов-на-Дону": "4959",
    "Уфа": "176245",
    "Красноярск": "4827",
    "Воронеж": "4713",
    "Пермь": "4927",
    "Волгоград": "4704",
    "Краснодар": "4820",
    "Саратов": "4969",
    "Тюмень": "5024",
    "Тольятти": "5011",
    "Ижевск": "4770",
    "Барнаул": "4668",
    "Иркутск": "4774",
    "Ульяновск": "5027",
    "Хабаровск": "5039",
    "Ярославль": "5075",
}

# metro network -> [(station name, station id), ...]
METRO_STATIONS: dict[str, list[tuple[str, str]]] = {
    "Московский": [
        ("Авиамоторная", "1"),
        ("Автозаводская", "2"),
        ("Академическая", "3"),
        ("Александровский сад", "4"),
        ("Алексеевская", "5"),
        ("Арбатская", "8"),
        ("Бауманская", "13"),
        ("Киевская", "56"),
        ("Тверская", "148"),
        ("Театральная", "147"),
    ],
    "Петербургский": [
        ("Автово", "167"),
        ("Адмиралтейская", "168"),
        ("Невский проспект", "189"),
        ("Площадь Восстания", "192"),
    ],
}


def list_locations() -> list[list[str]]:
    """Reference-shaped listing: list of [name, id] pairs.

    (reference: cianparser/cianparser.py:12-13 returns CITIES verbatim)
    """
    return [[name, rid] for name, rid in CITIES.items()]


def list_metro_stations() -> dict[str, list[tuple[str, str]]]:
    """(reference: cianparser/cianparser.py:16-17)"""
    return METRO_STATIONS


def location_id(location: str) -> str:
    """Resolve a location name to its region id.

    Deliberate deviation: the reference constructs a ValueError for an
    unknown location but never raises it, silently yielding region=None
    (reference: cianparser/cianparser.py:178-188).  We raise for real.
    """
    try:
        return CITIES[location]
    except KeyError:
        raise ValueError(
            f"You entered {location!r}, which does not exist in the base. "
            f"See available values via cianparser_spark.list_locations()"
        ) from None


def metro_station_id(network: str, station: str) -> str | None:
    """(network, station) -> metro id; None when unknown.

    (reference: cianparser/url_builder.py:89-94 — silent no-op on miss)
    """
    for name, mid in METRO_STATIONS.get(network, []):
        if name == station:
            return mid
    return None


def load_cities_csv(path: str) -> dict[str, str]:
    """Optional full-table override: two-column CSV name,id."""
    import csv

    out: dict[str, str] = {}
    with open(path, newline="", encoding="utf-8") as fh:
        for row in csv.reader(fh):
            if len(row) >= 2:
                out[row[0]] = row[1]
    return out
