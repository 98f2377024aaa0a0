"""Compatibility sink: engine rows -> reference-shaped dicts / CSV.

The engine stores one fixed nullable superset schema; the reference
returns per-deal-type dynamic dicts with ``-1``/``""``/``0`` sentinels
(reference: README.md:308-310) whose key ORDER follows dict-union
insertion order (reference: cianparser/helpers.py:6-7).  This module
reconstructs those rows exactly, so the facade's return value and the
``;``-CSV sink are drop-in replacements, and engine-vs-simulator tests
compare dicts directly.
"""

from __future__ import annotations

import csv

from cianparser_spark.engine import model

_DETAIL_FLAT = [
    "year_of_construction", "object_type", "house_material_type",
    "heating_type", "finish_type", "living_meters", "kitchen_meters",
    "floor", "floors_count", "phone",
]
_DETAIL_SUBURBAN = [
    "year_of_construction", "house_material_type", "land_plot",
    "land_plot_status", "heating_type", "gas_type", "water_supply_type",
    "sewage_system", "bathroom", "living_meters", "floors_count", "phone",
]
_DETAIL_NEWOBJECT = [
    "year_of_construction", "house_material_type", "finish_type",
    "ceiling_height", "class", "parking_type", "floors_from", "floors_to",
]
_LONGISH = {
    "floor", "floors_count", "rooms_count", "price", "price_per_month",
    "floors_from", "floors_to", "total_meters",
}


def _sent(row: dict, col: str, string_default=""):
    v = row.get(col)
    if v is not None:
        return v
    return -1 if col in _LONGISH else string_default


def _detail_value(row: dict, col: str):
    """Detail fields default to int -1 (strings when present),
    phone defaults to "" (reference: cianparser/flat/page.py:20-31)."""
    v = row.get(col)
    if col == "phone":
        return v if v is not None else ""
    if col in ("floor", "floors_count", "floors_from", "floors_to"):
        return v if v is not None else -1
    # suburban floors_count is typed long internally but the reference
    # keeps the raw span string
    return v if v is not None else -1


def to_reference_row(row: dict, deal_type_user: str, with_extra: bool, project: bool = True) -> dict:
    """One engine offers-row (dict of column->value) -> reference dict."""
    kind = row.get("accommodation_type")
    out: dict = {}
    if kind == "newobject":
        out["name"] = _sent(row, "name")
        out["location"] = _sent(row, "location")
        out["accommodation_type"] = "newobject"
        out["url"] = _sent(row, "url")
        out["full_full_location_address"] = _sent(row, "full_full_location_address")
        for col in _DETAIL_NEWOBJECT:
            out[col] = _detail_value(row, col)
        if row.get("builder") is not None:
            out["builder"] = row["builder"]
        return out

    out["author"] = _sent(row, "author")
    out["author_type"] = _sent(row, "author_type")
    out["url"] = _sent(row, "url")
    out["location"] = _sent(row, "location")
    out["deal_type"] = _sent(row, "deal_type")
    out["accommodation_type"] = kind
    if kind == "suburban":
        out["suburban_type"] = _sent(row, "suburban_type")
    else:
        out["floor"] = _sent(row, "floor")
        out["floors_count"] = _sent(row, "floors_count")
        out["rooms_count"] = _sent(row, "rooms_count")
        out["total_meters"] = _sent(row, "total_meters")
    # price block (reference: cianparser/helpers.py:268-295 defaults)
    out["price_per_month"] = _sent(row, "price_per_month")
    out["commissions"] = row.get("commissions") if row.get("commissions") is not None else 0
    if row.get("price") is not None:
        out["price"] = row["price"]
    if with_extra:
        cols = _DETAIL_SUBURBAN if kind == "suburban" else _DETAIL_FLAT
        for col in cols:
            v = _detail_value(row, col)
            if col == "floors_count" and kind == "suburban" and v != -1:
                v = str(v)  # reference keeps the raw span text
            out[col] = v
    out["district"] = _sent(row, "district")
    out["street"] = _sent(row, "street")
    out["house_number"] = _sent(row, "house_number")
    out["underground"] = _sent(row, "underground")
    if row.get("deal_type") == "sale" and kind == "flat":
        out["residential_complex"] = _sent(row, "residential_complex")

    if project:
        drop = model.projection_drop_set(deal_type_user)
        out = {k: v for k, v in out.items() if k not in drop}
    return out


def to_reference_rows(offers_df, seeds, project: bool = True) -> list[dict]:
    """Collect engine offers in crawl order as reference-shaped dicts."""
    by_seed = {s.seed_id: s for s in seeds}
    rows = offers_df.orderBy(*model.ORDER_COLS).collect()
    out = []
    for r in rows:
        d = r.asDict()
        seed = by_seed[d["seed_id"]]
        with_extra = bool(seed.with_extra_data) or seed.accommodation_type == "newobject"
        out.append(to_reference_row(d, seed.deal_type, with_extra, project))
    return out


def write_reference_csv(rows: list[dict], path: str) -> None:
    """``;``-delimited CSV, header from the first row's keys
    (reference: cianparser/base_list.py:88-95) — written once, not
    rewritten per offer."""
    if not rows:
        return
    with open(path, "w", newline="", encoding="utf-8") as fh:
        writer = csv.DictWriter(fh, rows[0].keys(), delimiter=";")
        writer.writeheader()
        writer.writerows(rows)
