"""Field-extraction semantics — the reference's parsers, re-expressed.

Record-level pure functions mirroring the reference's BeautifulSoup
walkers.  The Spark engine calls these inside Arrow-batched UDFs
(engine/parse.py); the sequential oracle simulator calls them directly,
so engine-vs-simulator comparisons share one extraction definition and
test only the *distribution* semantics (ordering, dedup, politeness).

Faithfulness notes (each function cites its reference twin):
* the reference iterates ``STREET_TYPES`` — a ``set`` — so its match
  order is hash-randomized per process; we scan a fixed tuple.  Results
  differ only for strings containing two different street types, which
  the synthetic corpus never emits.
* quirks preserved on purpose: ``find("м²")`` is compared against
  ``None`` (never true) so a missing "м²" silently slices ``[: -1]``;
  the floor window is ``rfind("этаж") - 7`` which can go negative.
"""

from __future__ import annotations

import re

from cianparser_spark.semantics import html as H

# (reference: cianparser/constants.py:60-63)
STREET_TYPES: tuple[str, ...] = (
    "ул.", "улица", "аллея", "бульвар", "линия", "набережная", "тракт",
    "тупик", "шоссе", "переулок", "проспект", "проезд", "раздъезд",
    "мост", "авеню",
)
NOT_STREET_ADDRESS_ELEMENTS = frozenset(
    {"ЖК", "м.", "мкр.", "Жилой комплекс", "Жилой Комплекс"}
)

# (reference: cianparser/constants.py:9)
FLOATS_RE = re.compile(r"[+-]? *(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?")
_INTS_RE = re.compile(r"\d+")

# per-deal-type projection drop sets (reference: cianparser/constants.py:65-67)
FIELDS_RENT_LONG = frozenset({"price_per_month", "commissions"})
FIELDS_RENT_SHORT = frozenset({"price_per_day"})
FIELDS_SALE = frozenset({"price", "residential_complex", "object_type", "finish_type"})


def rooms_count(description: str) -> int:
    """Substring cascade classifier (reference: cianparser/helpers.py:10-24)."""
    if "1-комн" in description or "Студия" in description:
        return 1
    for n in (2, 3, 4, 5):
        if f"{n}-комн" in description:
            return n
    return -1


# ---------------------------------------------------------------- author

_AUTHOR_LABELS: tuple[tuple[str, str], ...] = (
    # priority-ordered; label span's WHOLE text must equal the label
    # (reference: cianparser/helpers.py:37-87 — bs4 Tag containment
    # degenerates to whole-text match for simple label spans)
    ("Агентство недвижимости", "real_estate_agent"),
    ("Собственник", "homeowner"),
    ("Риелтор", "realtor"),
    ("Ук・оф.Представитель", "official_representative"),
    ("Представитель застройщика", "representative_developer"),
    ("Застройщик", "developer"),
)


def author(card_html: str) -> dict:
    """(reference: cianparser/helpers.py:37-87)"""
    first_div = H.first_block(card_html, "div", "data-name", "LinkArea")
    spans = H.span_texts(first_div if first_div is not None else card_html)
    for label, author_type in _AUTHOR_LABELS:
        for i, s in enumerate(spans):
            if s == label and i + 1 < len(spans):
                value = spans[i + 1]
                if author_type == "real_estate_agent":
                    value = value.replace(",", ".").strip()
                return {"author": value, "author_type": author_type}
    for s in spans:
        if "ID" in s:
            return {"author": s, "author_type": "unknown"}
    return {"author": "", "author_type": ""}


# ----------------------------------------------------------------- price

def price(card_html: str) -> dict:
    """(reference: cianparser/helpers.py:268-295)

    Rent rows gain ``price_per_month`` (+ ``commissions`` from a "NN%"
    token); sale rows gain ``price``; defaults −1 / 0.  The first
    MainPrice span decides.
    """
    area = H.first_block(card_html, "div", "data-name", "LinkArea") or card_html
    out: dict = {"price_per_month": -1, "commissions": 0}
    for span in H.blocks(area, "span", "data-mark", "MainPrice"):
        t = H.text(span)
        if "₽/мес" in t:
            out["price_per_month"] = int("".join(t[: t.find("₽/мес") - 1].split()))
            if "%" in t:
                out["commissions"] = int(
                    t[t.find("%") - 2 : t.find("%")].replace(" ", "")
                )
            return out
        if "₽" in t and "млн" not in t:
            out["price"] = int("".join(t[: t.find("₽") - 1].split()))
            return out
    return out


# ------------------------------------------------------------------ spec

def specification(card_html: str) -> dict:
    """Title-line parse: area, floor/floors, rooms
    (reference: cianparser/helpers.py:298-332)."""
    out: dict = {"floor": -1, "floors_count": -1, "rooms_count": -1, "total_meters": -1}
    area = H.first_block(card_html, "div", "data-name", "LinkArea") or card_html
    rows = H.blocks(area, "div", "data-name", "GeneralInfoSectionRowComponent")
    if not rows:
        return out
    title = H.text(rows[0])

    # NB: reference tests `find("м²") is not None` (always true), so a
    # missing marker yields pos −1 → slice [:-1]; preserved verbatim.
    meters_str = title[: title.find("м²")].replace(",", ".")
    floats = FLOATS_RE.findall(meters_str)
    if floats:
        out["total_meters"] = float(floats[-1].replace(" ", "").replace("-", ""))

    if "этаж" in title:
        window = title[title.rfind("этаж") - 7 : title.rfind("этаж")]
        parts = window.split("/")
        if len(parts) == 2:
            ints = _INTS_RE.findall(parts[0])
            if ints:
                out["floor"] = int(ints[-1])
            ints = _INTS_RE.findall(parts[1])
            if ints:
                out["floors_count"] = int(ints[-1])

    out["rooms_count"] = rooms_count(title)
    return out


# -------------------------------------------------------------- location

def _complex_name(t: str) -> str | None:
    if "ЖК" in t and "«" in t and "»" in t:
        return t.split("«")[1].split("»")[0]
    return None


def _looks_like_house_number(token: str) -> bool:
    return (
        any(c.isdigit() for c in token)
        and "жк" not in token.lower()
        and not any(st in token.lower() for st in STREET_TYPES)
        and len(token) < 10
    )


def _strip_street(value: str, street_type: str) -> str:
    street = value.strip()
    if street_type == "улица":
        street = street.replace("улица", "")
    return street


def location_flat(card_html: str, is_sale: bool) -> dict:
    """District/street/house/underground/complex from address rows
    (reference: cianparser/helpers.py:121-265)."""
    area = H.first_block(card_html, "div", "data-name", "LinkArea") or card_html
    rows = [H.text(b) for b in H.blocks(area, "div", "data-name", "GeneralInfoSectionRowComponent")]

    loc: dict = {"district": "", "street": "", "house_number": "", "underground": ""}
    if is_sale:
        loc["residential_complex"] = ""

    for t in rows:
        rc = _complex_name(t)
        if rc is not None:
            loc["residential_complex"] = rc

        if "р-н" in t and len(t) < 250:
            parts = t.split(",")
            if len(parts) < 2:
                continue
            rc = _complex_name(parts[0])
            if rc is not None:
                loc["residential_complex"] = rc
            if ", м. " in t:
                metro = t.split(", м. ")[1]
                loc["underground"] = metro.split(",")[0] if "," in metro else metro
            if _looks_like_house_number(parts[-1]):
                loc["house_number"] = parts[-1].strip()

            for ind, elem in enumerate(parts):
                if "р-н" not in elem:
                    continue
                loc["district"] = elem.replace("р-н", "").strip()
                if "ЖК" in parts[-1]:
                    loc["residential_complex"] = parts[-1].strip()
                if "ЖК" in parts[-2]:
                    loc["residential_complex"] = parts[-2].strip()
                for st in STREET_TYPES:
                    if st in parts[-1]:
                        loc["street"] = _strip_street(parts[-1], st)
                        return loc
                    if st in parts[-2]:
                        loc["street"] = _strip_street(parts[-2], st)
                        return loc
                for candidate in parts[ind + 1 :]:
                    if set(candidate.split(" ")) & NOT_STREET_ADDRESS_ELEMENTS:
                        continue
                    if len(candidate.strip().replace(" ", "")) < 4:
                        continue
                    loc["street"] = candidate.strip()
                    return loc
            return loc

    if loc["district"] == "":
        for t in rows:
            if ", м. " in t and len(t) < 250:
                metro = t.split(", м. ")[1]
                loc["underground"] = metro.split(",")[0] if "," in metro else metro
                parts = t.split(",")
                if len(parts) < 2:
                    continue
                if "ЖК" in parts[-1]:
                    loc["residential_complex"] = parts[-1].strip()
                if "ЖК" in parts[-2]:
                    loc["residential_complex"] = parts[-2].strip()
                if _looks_like_house_number(parts[-1]):
                    loc["house_number"] = parts[-1].strip()
                for st in STREET_TYPES:
                    if st in parts[-1]:
                        loc["street"] = _strip_street(parts[-1], st)
                        return loc
                    if st in parts[-2]:
                        loc["street"] = _strip_street(parts[-2], st)
                        return loc
            for st in STREET_TYPES:
                if (f", {st} " in t) or (f" {st}, " in t):
                    parts = t.split(",")
                    if len(parts) < 3:
                        continue
                    if _looks_like_house_number(parts[-1]):
                        loc["house_number"] = parts[-1].strip()
                    if st in parts[-1]:
                        loc["street"] = _strip_street(parts[-1], st)
                        loc["district"] = parts[-2].strip()
                        return loc
                    if st in parts[-2]:
                        loc["street"] = _strip_street(parts[-2], st)
                        loc["district"] = parts[-3].strip()
                        return loc
    return loc


def location_suburban(card_html: str) -> dict:
    """GeoLabel scan, last match wins; house number = label after the
    street label when it contains a digit
    (reference: cianparser/helpers.py:90-118)."""
    area = H.first_block(card_html, "div", "data-name", "LinkArea") or card_html
    loc = {"district": "", "underground": "", "street": "", "house_number": ""}
    for section in H.blocks(area, "div", "data-name", "GeneralInfoSectionRowComponent"):
        labels = [t for _, t in H.anchors(section, "data-name", "GeoLabel")]
        for i, label in enumerate(labels):
            if "м. " in label:
                loc["underground"] = label
            if "р-н" in label or "поселение" in label:
                loc["district"] = label
            if any(st in label.lower() for st in STREET_TYPES):
                loc["street"] = label
                if i + 1 < len(labels) and any(c.isdigit() for c in labels[i + 1]):
                    loc["house_number"] = labels[i + 1]
    return loc


# ------------------------------------------------------- detail pages

def _phone(page_html: str) -> str:
    """(reference: cianparser/flat/page.py:65-68)"""
    pos = page_html.find("+7")
    if pos < 0:
        return ""
    return (
        page_html[pos : pos + 16].split('"')[0].replace(" ", "").replace("-", "")
    )


def _label_next(spans: list[str], i: int) -> str:
    return spans[i + 1] if i + 1 < len(spans) else ""


def detail_flat(page_html: str) -> dict:
    """Label-span → next-span value pairs on a flat detail page
    (reference: cianparser/flat/page.py:19-70)."""
    out: dict = {
        "year_of_construction": -1, "object_type": -1,
        "house_material_type": -1, "heating_type": -1, "finish_type": -1,
        "living_meters": -1, "kitchen_meters": -1,
        "floor": -1, "floors_count": -1, "phone": "",
    }
    exact = {
        "Тип жилья": "object_type",
        "Тип дома": "house_material_type",
        "Отопление": "heating_type",
        "Отделка": "finish_type",
        "Площадь кухни": "kitchen_meters",
        "Жилая площадь": "living_meters",
    }
    spans = H.span_texts(page_html)
    for i, s in enumerate(spans):
        field = exact.get(s)
        if field is not None:
            out[field] = _label_next(spans, i)
        if "Год постройки" in s or "Год сдачи" in s:
            out["year_of_construction"] = _label_next(spans, i)
        if s == "Этаж":
            ints = _INTS_RE.findall(_label_next(spans, i))
            if len(ints) == 2:
                out["floor"] = int(ints[0])
                out["floors_count"] = int(ints[1])
    out["phone"] = _phone(page_html)
    return out


def detail_suburban(page_html: str) -> dict:
    """(reference: cianparser/suburban/page.py:19-83)"""
    out: dict = {
        "year_of_construction": -1, "house_material_type": -1,
        "land_plot": -1, "land_plot_status": -1, "heating_type": -1,
        "gas_type": -1, "water_supply_type": -1, "sewage_system": -1,
        "bathroom": -1, "living_meters": -1, "floors_count": -1,
        "phone": "",
    }
    exact = {
        "Материал дома": "house_material_type",
        "Участок": "land_plot",
        "Статус участка": "land_plot_status",
        "Отопление": "heating_type",
        "Газ": "gas_type",
        "Водоснабжение": "water_supply_type",
        "Канализация": "sewage_system",
        "Санузел": "bathroom",
        "Площадь кухни": "kitchen_meters",  # created on demand, as in reference
        "Общая площадь": "living_meters",
        "Этажей в доме": "floors_count",
    }
    spans = H.span_texts(page_html)
    for i, s in enumerate(spans):
        field = exact.get(s)
        if field is not None:
            out[field] = _label_next(spans, i)
        if "Год постройки" in s or "Год сдачи" in s:
            out["year_of_construction"] = _label_next(spans, i)
    out["phone"] = _phone(page_html)
    return out


def detail_newobject(page_html: str) -> dict:
    """(reference: cianparser/newobject/page.py:19-65)"""
    out: dict = {
        "year_of_construction": -1, "house_material_type": -1,
        "finish_type": -1, "ceiling_height": -1, "class": -1,
        "parking_type": -1, "floors_from": -1, "floors_to": -1,
    }
    exact = {
        "Тип дома": "house_material_type",
        "Отделка": "finish_type",
        "Высота потолков": "ceiling_height",
        "Класс": "class",
        "Парковка": "parking_type",
    }
    spans = H.span_texts(page_html)
    for i, s in enumerate(spans):
        field = exact.get(s)
        if field is not None:
            out[field] = _label_next(spans, i)
        if "Срок сдачи" in s:
            out["year_of_construction"] = _label_next(spans, i)
        if "Застройщик" in s and "Проектная декларация" in s:
            out["builder"] = s.split(".")[0]
        if s == "Этажность":
            ints = _INTS_RE.findall(_label_next(spans, i))
            if len(ints) == 2:
                out["floors_from"], out["floors_to"] = int(ints[0]), int(ints[1])
            elif len(ints) == 1:
                out["floors_from"] = out["floors_to"] = int(ints[0])
    return out


# ------------------------------------------------------------ card level

def card_url(card_html: str) -> str:
    """First href inside LinkArea (reference: cianparser/flat/list.py:47)."""
    area = H.first_block(card_html, "div", "data-name", "LinkArea") or card_html
    return H.first_href(area) or ""


def card_image_ids(card_html: str) -> list[str]:
    """Graft addition: payload references carried by each card."""
    return H.attr_values(card_html, "data-image-id")


def list_page_cards(page_html: str, kind: str) -> list[str]:
    """Card blocks on a list page (reference selectors:
    flat/suburban cianparser/flat/list.py:30 article[data-name=CardComponent];
    newobject cianparser/newobject/list.py:51 div[data-mark=GKCard])."""
    if kind == "newobject":
        return H.blocks(page_html, "div", "data-mark", "GKCard")
    return H.blocks(page_html, "article", "data-name", "CardComponent")


def has_captcha(page_html: str) -> bool:
    """(reference: cianparser/flat/list.py:22 — ``text.find("Captcha") > 0``)"""
    return H.text(page_html).find("Captcha") > 0


def has_header(page_html: str) -> bool:
    """(reference: cianparser/flat/list.py:26-28)"""
    return H.first_block(page_html, "div", "data-name", "HeaderDefault") is not None


def parse_newobject_card(card_html: str) -> dict:
    """(reference: cianparser/newobject/list.py:66-72)"""
    from cianparser_spark.semantics.urls import url_host

    name_span = H.first_block(card_html, "span", "data-mark", "Text")
    link = H.first_block(card_html, "a", "data-mark", "Link")
    addr = H.first_block(card_html, "div", "data-mark", "CellAddressBlock")
    raw_href = (H.first_href(link) if link else None) or ""
    return {
        "name": H.text(name_span) if name_span else "",
        "url": "https://" + url_host(raw_href),
        "full_full_location_address": H.text(addr) if addr else "",
    }
