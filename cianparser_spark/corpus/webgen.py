"""Deterministic synthetic web: url → (status, html), pure function.

Stands in for the remote site.  Honors the reference's pushed-down
query parameters — room filters, min/max price, homeowner-only, sort
order (reference: cianparser/url_builder.py:55-120) — and the 54-page
site cap (reference: README.md:300-306), so predicate/sort/limit
pushdown is end-to-end observable.  Fault injection (transient 500,
429, permanently dead URLs, header-less 200 pages, CAPTCHA walls) is a
deterministic function of the URL + attempt number, so the sequential
simulator and the distributed engine see the *identical* web.

Ground truth for every rendered field is exposed (``offer_truth``,
``caption_fields``) so extraction tests assert recovery of exact
values, and the ``images`` payload table is generated from the same
caption source (``images_rows``) making caption-equality and
pixel-PSNR invariants checkable end-to-end.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field
from functools import lru_cache
from urllib.parse import parse_qs, urlparse

from cianparser_spark.corpus import imaging

PAGE_SIZE = 28          # offers per list page (reference: README.md:301)
SITE_PAGE_CAP = 54      # list pages served per query (reference: README.md:300)


def stable_hash(s: str) -> int:
    """Process-independent 64-bit hash (blake2b-8)."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


@dataclass(frozen=True)
class WebConfig:
    n_images: int = 2000
    universe_base: int = 120        # offers per query before filters...
    universe_span: int = 240        # ...plus hash(query) % span
    mirrors: int = 1                # unused by default; hosts come from the URL
    captcha_pages: frozenset = field(default_factory=frozenset)  # full page URLs
    fail_500_mod: int = 37          # transient 500, recovers at attempt 2
    fail_429_mod: int = 41          # 429 on attempt 0
    dead_mod: int = 0               # permanent 500 when > 0
    noheader_mod: int = 0           # header-less 200 list page when > 0
    robots_disallow: tuple = ()     # path(-prefix) patterns served in robots.txt
    # Proxy modeling (reference: cianparser/proxy_pool.py:9-61).  A
    # proxy is an opaque string; its health is a deterministic property
    # of the config so the sequential simulator and the distributed
    # engine observe the identical pool behavior.  Proxies are
    # result-transparent: fetching through a WORKING proxy returns the
    # same bytes as a direct fetch (like the real site), so the pool
    # affects probe/rotation bookkeeping, never content.
    proxies: tuple = ()                       # configured pool, in order
    proxy_unavailable: frozenset = field(default_factory=frozenset)
    proxy_captcha: frozenset = field(default_factory=frozenset)
    # The reference couples a detail-fetch failure to the PAGE retry
    # counter (an exception aborts parse_list_offers_page mid-loop,
    # cianparser/cianparser.py:81-87), so cards after a failing detail
    # can be silently dropped and a later duplicate resurrects the
    # fetch with the session-global attempt counter continuing.  The
    # engine's page-coupled detail group scheduler (engine/crawler.py)
    # replicates this exactly — bit-match tests run with this ON
    # (tests/test_detail_faults.py); False remains available to
    # isolate list-side faults.
    faults_on_details: bool = True
    # pre-rendered page store (corpus/snapshot.py): when set, 200
    # responses are served from the mmapped snapshot instead of being
    # re-rendered — the network-fetch analog.  Rendering is
    # deterministic, so behavior is bit-identical either way; urls
    # missing from the snapshot fall through to live rendering.
    snapshot_path: str | None = None
    # real-site fidelity toggle: render HeaderDefault city names in
    # PREPOSITIONAL case ("Снять квартиру в Москве…"), as cian.ru
    # does — forcing the definer pipeline to actually perform the
    # reference's pymorphy2 normal-form step (semantics/morphru.py is
    # the scoped stand-in).  Default False keeps the historical
    # nominative rendering every existing oracle was pinned against.
    inflect_city_headers: bool = False


DEFAULT_CONFIG = WebConfig()

def _region_maps():
    """Lazy reverse maps from the vendored dimension data: region id →
    city name (CITIES first, OTHER_CITIES fallback) and metro-station
    id → station name.  The real site obviously knows its own
    geography; the synthetic one gets it from the same vendored tables
    the parser ships (dims_data.py)."""
    global _REGION_CITY, _METRO_NAME
    if _REGION_CITY is None:
        from cianparser_spark.dims_data import CITIES, METRO_STATIONS, OTHER_CITIES

        rc = {}
        for name, rid in OTHER_CITIES.items():
            rc.setdefault(rid, name)
        for name, rid in CITIES.items():
            rc[rid] = name
        _REGION_CITY = rc
        _METRO_NAME = {
            mid: st for stations in METRO_STATIONS.values() for st, mid in stations
        }
    return _REGION_CITY, _METRO_NAME


_REGION_CITY: dict[str, str] | None = None
_METRO_NAME: dict[str, str] | None = None


def region_city(region: str) -> str | None:
    """City name for a region id, or None when the id is not a city."""
    return _region_maps()[0].get(region)


def metro_station_name(metro_id: str) -> str | None:
    return _region_maps()[1].get(metro_id)


_DISTRICTS = ["Центральный", "Басманный", "Таганский", "Пресненский", "Академический", "Ленинский"]
_STREETS = ["Тверская", "Садовая", "Ленина", "Мира", "Пушкина", "Гагарина", "Лесная"]
_METROS = ["Бауманская", "Киевская", "Тверская", "Театральная", "Алексеевская"]
_AGENCIES = ["Этажи", "Миэль", "Инком-Недвижимость", "Самолет Плюс", "Этажи, офис Центр"]
_PERSONS = ["Иван Петров", "Анна Соколова", "Сергей Волков", "Мария Белова"]
_COMPLEXES = [("Небо", "nebo"), ("Парк Легенд", "park"), ("Луна", "luna"), ("Река", "river"), ("Рассвет", "sunrise")]
_MATERIALS = ["Монолитный", "Кирпичный", "Панельный"]
_HEATING = ["Центральное", "Автономное"]
_FINISH = ["Косметический", "Евроремонт", "Без отделки"]
_OBJECT_TYPES = ["Вторичка", "Новостройка"]


# ------------------------------------------------------------- captions

def caption_fields(idx: int) -> dict:
    """Spec ground truth carried by caption #idx (and by every offer
    card whose image base is idx)."""
    h = stable_hash(f"img|{idx}")
    rooms_idx = h % 6  # 0 = studio
    meters = 20.0 + (h >> 8) % 120 + ((h >> 16) % 10) / 10.0
    floors = 5 + (h >> 24) % 20
    floor = 1 + (h >> 32) % floors
    label = "Студия" if rooms_idx == 0 else f"{rooms_idx}-комн. кв."
    return {
        "rooms_label": label,
        "rooms_count": 1 if rooms_idx == 0 else rooms_idx,
        "total_meters": round(meters, 1),
        "floor": floor,
        "floors_count": floors,
    }


def caption_text(idx: int) -> str:
    f = caption_fields(idx)
    meters = f"{f['total_meters']:.1f}".replace(".", ",")
    return f"{f['rooms_label']}, {meters} м², {f['floor']}/{f['floors_count']} этаж"


def image_pixels(i: int, dup_rate_mod: int = 20):
    """Decoded pixels of image #i.  ~1/dup_rate_mod images duplicate
    their predecessor's pixels (same phash, new id) to exercise phash
    dedup; the chain-walk makes this a pure function of i, so
    partition-parallel generation equals sequential generation."""
    j = i
    while j > 0 and stable_hash(f"imgpx|{j}") % dup_rate_mod == 0:
        j -= 1
    h = stable_hash(f"imgpx|{j}")
    return imaging.gen_pixels(h, (64, 96, 128)[h % 3], (64, 96, 128)[(h >> 4) % 3])


def image_row(i: int, dup_rate_mod: int = 20) -> dict:
    fmt = "png" if i % 2 == 0 else "jpeg"
    pixels = image_pixels(i, dup_rate_mod)
    return {
        "image_id": f"img{i:08d}",
        "bytes": imaging.encode(pixels, fmt),
        "w": int(pixels.shape[1]),
        "h": int(pixels.shape[0]),
        "fmt": fmt,
        "caption": caption_text(i),
        "phash": imaging.phash64(pixels),
    }


def images_rows(n: int, dup_rate_mod: int = 20):
    """Payload table rows per BASELINE.json input_hint."""
    for i in range(n):
        yield image_row(i, dup_rate_mod)




# ------------------------------------------------------------ query model

def parse_list_url(url: str) -> dict:
    u = urlparse(url)
    q = {k: v[0] for k, v in parse_qs(u.query).items() if v}
    rooms = set()
    for k in q:
        if k.startswith("room") and k[4:].isdigit():
            rooms.add(int(k[4:]))
    return {
        "host": u.netloc,
        "newobject": "newobjects" in u.path,
        "page": int(q.get("p", "1")),
        "region": q.get("region", ""),
        "deal_type": q.get("deal_type", "sale"),
        "offer_type": q.get("offer_type", "flat"),
        "rooms": frozenset(rooms),
        "rent_period": q.get("type"),
        "suburban_type": q.get("object_type[0]"),
        "minprice": int(q["minprice"]) if "minprice" in q else None,
        "maxprice": int(q["maxprice"]) if "maxprice" in q else None,
        "is_by_homeowner": q.get("is_by_homeowner") == "1",
        "sort": q.get("sort"),
        "metro": q.get("metro[0]"),
    }


def query_key(url: str) -> str:
    """Canonical query identity: everything except the page number."""
    p = parse_list_url(url)
    rooms = ",".join(map(str, sorted(p["rooms"])))
    key = (
        f"{p['region']}|{p['deal_type']}|{p['offer_type']}|{rooms}|"
        f"{p['rent_period']}|{p['suburban_type']}|{p['minprice']}|{p['maxprice']}|"
        f"{p['is_by_homeowner']}|{p['sort']}|{int(p['newobject'])}"
    )
    # appended only when present so every metro-less query keeps its
    # pre-existing identity (and dup-injection hashes)
    if p["metro"]:
        key += f"|metro={p['metro']}"
    return key


def _universe_key(p: dict) -> str:
    rooms = ",".join(map(str, sorted(p["rooms"])))
    return f"{p['region']}|{p['deal_type']}|{p['offer_type']}|{rooms}|{p['rent_period']}|{p['suburban_type']}|{int(p['newobject'])}"


def offer_truth(oid: int, deal_type: str, kind: str, cfg: WebConfig = DEFAULT_CONFIG) -> dict:
    """All generated attributes of offer ``oid`` — functions of the id
    alone, so list cards and detail pages agree."""
    h = stable_hash(f"offer|{oid}")
    base = oid % cfg.n_images
    spec = caption_fields(base)
    is_sale = deal_type == "sale"
    price = 3_000_000 + (h % 12_000) * 1_000 if is_sale else 25_000 + (h % 300) * 500
    author_roll = (h >> 8) % 10
    if author_roll < 4:
        author_type, author_raw = "real_estate_agent", _AGENCIES[(h >> 12) % len(_AGENCIES)]
    elif author_roll < 7:
        author_type, author_raw = "homeowner", _PERSONS[(h >> 12) % len(_PERSONS)]
    elif author_roll < 9:
        author_type, author_raw = "realtor", _PERSONS[(h >> 16) % len(_PERSONS)]
    else:
        author_type, author_raw = "unknown", f"ID {10000 + (h >> 12) % 90000}"
    district = _DISTRICTS[(h >> 20) % len(_DISTRICTS)]
    street = _STREETS[(h >> 24) % len(_STREETS)] + " ул."
    house = str(1 + (h >> 28) % 120)
    with_metro = (h >> 33) % 3 == 0
    metro = _METROS[(h >> 34) % len(_METROS)]
    complex_name, complex_slug = _COMPLEXES[(h >> 38) % len(_COMPLEXES)]
    with_complex = is_sale and kind == "flat" and (h >> 41) % 4 == 0
    commission = ((h >> 44) % 9) * 10 if not is_sale else 0
    phone = (
        f"+7 9{(h >> 46) % 10}{(h >> 48) % 10} "
        f"{100 + (h >> 50) % 900}-{10 + (h >> 52) % 90:02d}-{10 + (h >> 54) % 90:02d}"
    )
    return {
        "oid": oid,
        "image_base": base,
        "image_id": f"img{base:08d}",
        "caption": caption_text(base),
        **spec,
        "price": price,
        "commission": commission,
        "author_type": author_type,
        "author_raw": author_raw,
        # what the reference's extractor yields for the author value
        "author": author_raw.replace(",", ".").strip()
        if author_type == "real_estate_agent"
        else author_raw,
        "district": district,
        "street": street,
        "house_number": house,
        "with_metro": with_metro,
        "underground": metro if with_metro else "",
        "complex_name": complex_name,
        "complex_slug": complex_slug,
        "with_complex": with_complex,
        "phone": phone,
        "phone_expected": phone.replace(" ", "").replace("-", ""),
        # detail-page fields
        "object_type": _OBJECT_TYPES[(h >> 9) % 2],
        "house_material_type": _MATERIALS[(h >> 11) % 3],
        "heating_type": _HEATING[(h >> 13) % 2],
        "finish_type": _FINISH[(h >> 15) % 3],
        "kitchen_meters": round(6.0 + (h >> 17) % 14 + ((h >> 21) % 10) / 10.0, 1),
        "living_meters": round(spec["total_meters"] * 0.6, 1),
        "year_of_construction": 1960 + (h >> 23) % 65,
        "land_plot": f"{4 + (h >> 26) % 20} сот.",
        "land_plot_status": "ИЖС" if (h >> 30) % 2 == 0 else "СНТ",
        "gas_type": "Магистральный" if (h >> 31) % 2 == 0 else "Нет",
        "water_supply_type": "Центральное" if (h >> 32) % 2 == 0 else "Скважина",
        "sewage_system": "Септик" if (h >> 35) % 2 == 0 else "Центральная",
        "bathroom": "В доме" if (h >> 36) % 2 == 0 else "На улице",
        "ceiling_height": f"{2 + (h >> 37) % 2},{(h >> 39) % 10} м",
        "nclass": ("Комфорт", "Бизнес", "Эконом")[(h >> 42) % 3],
        "parking_type": ("Подземная", "Наземная")[(h >> 45) % 2],
        "floors_from": 5 + (h >> 47) % 10,
        "floors_to": 15 + (h >> 49) % 15,
        "builder_name": ("ПИК", "Самолет", "ЛСР")[(h >> 51) % 3],
    }


@lru_cache(maxsize=4096)
def _query_oids(url_sans_page: str, cfg: WebConfig = DEFAULT_CONFIG) -> tuple[int, ...]:
    """Server-side plan: universe → WHERE (pushed filters) → ORDER BY
    (pushed sort); pagination slices this."""
    p = parse_list_url(url_sans_page)
    uk = _universe_key(p)
    size = cfg.universe_base + stable_hash(f"universe|{uk}") % cfg.universe_span
    oids = [
        100_000_000 + stable_hash(f"{uk}#{i}") % 900_000_000 for i in range(size)
    ]

    deal = "sale" if p["deal_type"] == "sale" else "rent"
    kind = "newobject" if p["newobject"] else ("suburban" if p["offer_type"] == "suburban" else "flat")
    survivors = []
    for oid in oids:
        t = offer_truth(oid, deal, kind, cfg)
        if p["rooms"]:
            wanted = {9 if r == 9 else r for r in p["rooms"]}
            code = 9 if t["rooms_label"] == "Студия" else t["rooms_count"]
            if code not in wanted:
                continue
        if p["minprice"] is not None and t["price"] < p["minprice"]:
            continue
        if p["maxprice"] is not None and t["price"] > p["maxprice"]:
            continue
        if p["is_by_homeowner"] and t["author_type"] != "homeowner":
            continue
        if p["metro"] is not None:
            # pushed metro filter over the SAME universe (the site
            # filters listings by station; it does not re-seed them)
            station = metro_station_name(p["metro"])
            if station is None or not t["with_metro"] or t["underground"] != station:
                continue
        survivors.append((oid, t))

    sort = p["sort"]
    if sort == "price_object_order":
        survivors.sort(key=lambda x: (x[1]["price"], x[0]))
    elif sort == "total_price_desc":
        survivors.sort(key=lambda x: (-x[1]["price"], x[0]))
    elif sort == "area_order":
        survivors.sort(key=lambda x: (-x[1]["total_meters"], x[0]))
    elif sort == "creation_date_desc":
        survivors.sort(key=lambda x: -x[0])
    elif sort == "creation_date_asc":
        survivors.sort(key=lambda x: x[0])
    else:
        survivors.sort(key=lambda x: stable_hash(f"listing|{uk}|{x[0]}"))
    return tuple(oid for oid, _ in survivors)


def _strip_page(url: str) -> str:
    # the page hole is always "&p=N&" inside PAGE_CORE; normalize p=0
    import re

    return re.sub(r"([?&])p=\d+", r"\1p=0", url)


def page_count(url: str, cfg: WebConfig = DEFAULT_CONFIG) -> int:
    oids = _query_oids(_strip_page(url), cfg)
    return min(math.ceil(len(oids) / PAGE_SIZE), SITE_PAGE_CAP) if oids else 0


def page_oids(url: str, cfg: WebConfig = DEFAULT_CONFIG) -> list[int]:
    """Offer ids on this list page, including the ~8% adjacent-page
    duplicate injection (dedup exercise, first-wins)."""
    p = parse_list_url(url)
    base_url = _strip_page(url)
    oids = _query_oids(base_url, cfg)
    page = p["page"]
    if page > SITE_PAGE_CAP:
        return []
    cur = list(oids[(page - 1) * PAGE_SIZE : page * PAGE_SIZE])
    if page > 1:
        prev = oids[(page - 2) * PAGE_SIZE : (page - 1) * PAGE_SIZE]
        qk = query_key(url)
        for j in range(len(cur)):
            if j < len(prev) and stable_hash(f"dup|{qk}|{page}|{j}") % 12 == 0:
                cur[j] = prev[j]
    return cur


# --------------------------------------------------------------- render

def _offer_url(host: str, deal: str, kind: str, t: dict) -> str:
    if kind == "newobject":
        return f"https://zhk-{t['complex_slug']}-{t['oid']}.cian.ru/"
    return f"https://{host}/{deal}/{kind}/{t['oid']}/"


def _meters_str(v: float) -> str:
    return f"{v:.1f}".replace(".", ",")


def _price_str(v: int) -> str:
    return f"{v:,}".replace(",", " ")


def _render_card_flat(host: str, deal: str, t: dict, is_sale: bool,
                      city: str = "Город") -> str:
    url = _offer_url(host, deal, "flat", t)
    title = t["caption"]
    if t["with_metro"]:
        addr = f"{city}, р-н {t['district']}, м. {t['underground']}, {t['street']}, {t['house_number']}"
    else:
        addr = f"{city}, р-н {t['district']}, {t['street']}, {t['house_number']}"
    rows = [f'<div data-name="GeneralInfoSectionRowComponent"><span>{title}</span></div>']
    if t["with_complex"]:
        rows.append(
            f'<div data-name="GeneralInfoSectionRowComponent"><span>ЖК «{t["complex_name"]}»</span></div>'
        )
    rows.append(f'<div data-name="GeneralInfoSectionRowComponent"><span>{addr}</span></div>')
    if is_sale:
        price_html = f'<span data-mark="MainPrice">{_price_str(t["price"])} ₽</span>'
    else:
        suffix = f", комиссия {t['commission']}%" if t["commission"] else ""
        price_html = f'<span data-mark="MainPrice">{_price_str(t["price"])} ₽/мес{suffix}</span>'
    if t["author_type"] == "unknown":
        author_html = f"<span>{t['author_raw']}</span>"
    else:
        label = {
            "real_estate_agent": "Агентство недвижимости",
            "homeowner": "Собственник",
            "realtor": "Риелтор",
        }[t["author_type"]]
        author_html = f"<span>{label}</span><span>{t['author_raw']}</span>"
    return (
        '<article data-name="CardComponent">'
        '<div data-name="LinkArea">'
        f'<a href="{url}"><span>Объявление {t["oid"]}</span></a>'
        + "".join(rows)
        + price_html
        + author_html
        + f'<img data-image-id="{t["image_id"]}" src="/img/{t["image_base"]}.png">'
        "</div></article>"
    )


def _render_card_suburban(host: str, deal: str, t: dict, is_sale: bool,
                          city: str = "Город") -> str:
    url = _offer_url(host, deal, "suburban", t)
    geo = [f'<a data-name="GeoLabel" href="#">{city}</a>']
    geo.append(f'<a data-name="GeoLabel" href="#">{t["district"]} р-н</a>')
    if t["with_metro"]:
        geo.append(f'<a data-name="GeoLabel" href="#">м. {t["underground"]}</a>')
    geo.append(f'<a data-name="GeoLabel" href="#">{t["street"]}</a>')
    geo.append(f'<a data-name="GeoLabel" href="#">{t["house_number"]}</a>')
    if is_sale:
        price_html = f'<span data-mark="MainPrice">{_price_str(t["price"])} ₽</span>'
    else:
        price_html = f'<span data-mark="MainPrice">{_price_str(t["price"])} ₽/мес</span>'
    if t["author_type"] == "unknown":
        author_html = f"<span>{t['author_raw']}</span>"
    else:
        label = {
            "real_estate_agent": "Агентство недвижимости",
            "homeowner": "Собственник",
            "realtor": "Риелтор",
        }[t["author_type"]]
        author_html = f"<span>{label}</span><span>{t['author_raw']}</span>"
    return (
        '<article data-name="CardComponent">'
        '<div data-name="LinkArea">'
        f'<a href="{url}"><span>Дом {t["oid"]}</span></a>'
        f'<div data-name="GeneralInfoSectionRowComponent">{"".join(geo)}</div>'
        + price_html
        + author_html
        + f'<img data-image-id="{t["image_id"]}" src="/img/{t["image_base"]}.png">'
        "</div></article>"
    )


def _render_card_newobject(host: str, t: dict, city: str = "Город") -> str:
    url = _offer_url(host, "sale", "newobject", t)
    addr = f"{city}, р-н {t['district']}, {t['street']}, {t['house_number']}"
    return (
        '<div data-mark="GKCard">'
        f'<a data-mark="Link" href="{url}?from=card"><span data-mark="Text">ЖК «{t["complex_name"]}»</span></a>'
        f'<div data-mark="CellAddressBlock">{addr}</div>'
        f'<img data-image-id="{t["image_id"]}" src="/img/{t["image_base"]}.png">'
        "</div>"
    )


def header_title(region: str, deal_type: str,
                 inflect: bool = False) -> str | None:
    """Region-aware HeaderDefault title (what the city definer mines,
    reference: definers/definer_cities_id.py:35-48).

    A known city id yields the rent-long form the definer's extraction
    markers expect; an unknown id yields — deterministically — either
    no header at all (the definer's empty-``offers`` skip) or a
    region-level title that trips one of its reject substrings.  By
    default titles carry the city name in NOMINATIVE case (pymorphy2
    normal-form = identity, the documented historical deviation);
    ``inflect`` renders the real site's PREPOSITIONAL form instead
    (cfg.inflect_city_headers), which the definer must then normalize
    back (semantics/morphru.py)."""
    name = region_city(region)
    if name is not None:
        if inflect:
            from cianparser_spark.semantics import morphru

            name = morphru.prepositional_form(name)
        if deal_type == "sale":
            return f"ПродажаКупить квартиру в {name}"
        return f"АрендаСнять квартиру в {name} на длительный срок"
    h = stable_hash(f"headertitle|{region}")
    if h % 4 == 0:
        return None
    flavors = (
        "Московской области", "Краснодарском крае", "Республике Татарстан",
        "Ямало-Ненецком автономном округе", "России",
    )
    return f"АрендаСнять квартиру в {flavors[h % len(flavors)]} на длительный срок"


def render_list_page(url: str, cfg: WebConfig = DEFAULT_CONFIG, with_header: bool = True) -> str:
    p = parse_list_url(url)
    deal = "sale" if p["deal_type"] == "sale" else "rent"
    kind = "newobject" if p["newobject"] else ("suburban" if p["offer_type"] == "suburban" else "flat")
    is_sale = deal == "sale"
    city = region_city(p["region"]) or "Город"
    cards = []
    for oid in page_oids(url, cfg):
        t = offer_truth(oid, deal, kind, cfg)
        if kind == "newobject":
            cards.append(_render_card_newobject(p["host"], t, city))
        elif kind == "suburban":
            cards.append(_render_card_suburban(p["host"], deal, t, is_sale, city))
        else:
            cards.append(_render_card_flat(p["host"], deal, t, is_sale, city))
    title = (header_title(p["region"], p["deal_type"],
                          inflect=cfg.inflect_city_headers)
             if with_header else None)
    header = (
        f'<div data-name="HeaderDefault"><span>{title}</span></div>'
        if title is not None else ""
    )
    return f"<html><body>{header}<div data-name='SearchResults'>{''.join(cards)}</div></body></html>"


def _pairs(pairs: list[tuple[str, str]]) -> str:
    return "".join(f"<span>{k}</span><span>{v}</span>" for k, v in pairs)


def render_detail_page(url: str, cfg: WebConfig = DEFAULT_CONFIG) -> str:
    u = urlparse(url)
    parts = [x for x in u.path.split("/") if x]
    if u.netloc.startswith("zhk-"):  # newobject complex page
        oid = int(u.netloc.split(".")[0].rsplit("-", 1)[1])
        t = offer_truth(oid, "sale", "newobject", cfg)
        body = _pairs(
            [
                ("Срок сдачи", str(t["year_of_construction"])),
                ("Тип дома", t["house_material_type"]),
                ("Отделка", t["finish_type"]),
                ("Высота потолков", t["ceiling_height"]),
                ("Класс", t["nclass"]),
                ("Парковка", t["parking_type"]),
                ("Этажность", f"{t['floors_from']}-{t['floors_to']}"),
            ]
        )
        body += f"<span>Застройщик {t['builder_name']}. Проектная декларация на сайте</span>"
        return f"<html><body><h1>ЖК «{t['complex_name']}»</h1>{body}</body></html>"

    deal, kind, oid = parts[-3], parts[-2], int(parts[-1])
    t = offer_truth(oid, deal, kind, cfg)
    if kind == "suburban":
        body = _pairs(
            [
                ("Материал дома", t["house_material_type"]),
                ("Участок", t["land_plot"]),
                ("Статус участка", t["land_plot_status"]),
                ("Отопление", t["heating_type"]),
                ("Газ", t["gas_type"]),
                ("Водоснабжение", t["water_supply_type"]),
                ("Канализация", t["sewage_system"]),
                ("Санузел", t["bathroom"]),
                ("Общая площадь", f"{_meters_str(t['living_meters'])} м²"),
                ("Год постройки", str(t["year_of_construction"])),
                ("Этажей в доме", str(t["floors_count"])),
            ]
        )
    else:
        body = _pairs(
            [
                ("Тип жилья", t["object_type"]),
                ("Тип дома", t["house_material_type"]),
                ("Отопление", t["heating_type"]),
                ("Отделка", t["finish_type"]),
                ("Площадь кухни", f"{_meters_str(t['kitchen_meters'])} м²"),
                ("Жилая площадь", f"{_meters_str(t['living_meters'])} м²"),
                ("Год постройки", str(t["year_of_construction"])),
                ("Этаж", f"{t['floor']} из {t['floors_count']}"),
            ]
        )
    phone_html = f'<a href="tel:{t["phone"]}">Показать телефон</a>'
    img = f'<img data-image-id="{t["image_id"]}" src="/img/{t["image_base"]}.png">'
    return f"<html><body><h1>Объявление {oid}</h1>{body}{phone_html}{img}</body></html>"


# leading text matters: the reference detects a wall via
# ``text.find("Captcha") > 0`` — strictly positive (flat/list.py:22)
CAPTCHA_HTML = "<html><body><div>Проверка: Captcha</div><span>Подтвердите, что вы не робот</span></body></html>"


def is_list_url(url: str) -> bool:
    return "/cat.php?" in url or "/newobjects/list/?" in url


def robots_txt(host: str, cfg: WebConfig = DEFAULT_CONFIG) -> str:
    """The synthetic ``GET /robots.txt`` for a host — deterministic in
    cfg.  A real deployment fetches this once per host; the engine does
    the same against this resolver."""
    lines = ["User-agent: *"]
    if cfg.robots_disallow:
        lines += [f"Disallow: {p}" for p in cfg.robots_disallow]
    else:
        lines.append("Disallow:")  # allow all
    return "\n".join(lines) + "\n"


def probe_proxy(url: str, proxy: str, cfg: WebConfig = DEFAULT_CONFIG) -> tuple[bool, bool]:
    """One proxy health probe: ``(available, is_captcha)`` — the
    deterministic analog of ProxyPool.__is_available_proxy__ +
    __is_captcha__ (reference: proxy_pool.py:19-30,15-17)."""
    if proxy in cfg.proxy_unavailable:
        return False, False
    return True, proxy in cfg.proxy_captcha


def status_for(url: str, attempt: int, cfg: WebConfig = DEFAULT_CONFIG) -> int:
    if not cfg.faults_on_details and not is_list_url(url):
        return 200
    h = stable_hash(f"status|{url}")
    if cfg.dead_mod and h % cfg.dead_mod == 3:
        return 500
    if h % cfg.fail_500_mod == 0 and attempt < 2:
        return 500
    if h % cfg.fail_429_mod == 1 and attempt == 0:
        return 429
    return 200


def fetch(url: str, attempt: int = 0, cfg: WebConfig = DEFAULT_CONFIG,
          proxy: str | None = None) -> tuple[int, str]:
    """The synthetic GET.  Deterministic in (url, attempt, cfg, proxy).

    ``proxy`` models routing through the pool (reference sets
    session.proxies, cianparser.py:44): a WORKING proxy is
    result-transparent; a dead one yields 502, a captcha-walled one
    serves the wall — exactly the states ProxyPool filters out before
    handing a proxy to the session."""
    if proxy is not None:
        if proxy in cfg.proxy_unavailable:
            return 502, "<html><body>proxy unavailable</body></html>"
        if proxy in cfg.proxy_captcha:
            return 200, CAPTCHA_HTML
    status = status_for(url, attempt, cfg)
    if status != 200:
        return status, f"<html><body>error {status}</body></html>"
    if cfg.snapshot_path is not None:
        from cianparser_spark.corpus import snapshot as _snapshot

        html = _snapshot.open_snapshot(cfg.snapshot_path).get(url)
        if html is not None:
            return 200, html
    if is_list_url(url):
        if url in cfg.captcha_pages:
            return 200, CAPTCHA_HTML
        h = stable_hash(f"status|{url}")
        with_header = not (cfg.noheader_mod and h % cfg.noheader_mod == 5)
        return 200, render_list_page(url, cfg, with_header=with_header)
    return 200, render_detail_page(url, cfg)
