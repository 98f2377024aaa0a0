"""Fused fetch+parse stage — one Arrow-batched pass per wave.

Design: fetching and parsing are deliberately ONE ``mapInPandas``
stage so the multi-KB page HTML never crosses a shuffle boundary
(late materialization).  The stage consumes politeness-selected
frontier rows and emits a discriminated union:

    row_type='page'    fetch outcome per list URL (ok/captcha/noheader/http_error)
    row_type='card'    one parsed offer card (flat/suburban/newobject)
    row_type='offer'   a detail fetch merged with its card fields
    row_type='detail_err'  failed detail fetch (for retry/dead-letter)

Per-partition lineage counts ride on the 'page' rows via
``TaskContext.partitionId()``.

The per-executor "session" (the synthetic-web resolver here; an HTTP
session pool on a real deployment) is created once per partition in
the generator prologue — the reference's one-session-per-run
(reference: cianparser/cianparser.py:33-34) mapped to Spark's
execution model.
"""

from __future__ import annotations

import json

import pandas as pd

from cianparser_spark.corpus import webgen
from cianparser_spark.engine import model
from cianparser_spark.semantics import extract, urls

_ALL_COLS = [f.name for f in model.STAGE_SCHEMA.fields]


def _row(**kw) -> dict:
    return kw


def _blank_offer_fields() -> dict:
    return {c: None for c in model.OFFER_COLS}


def _set(fields: dict, col: str, value) -> None:
    fields[col] = model.sentinel_to_null(value, col)


def parse_card_fields(card_html: str, rt: dict) -> dict:
    """One card block -> offer-column dict (nulls for missing).

    Mirrors the reference's per-card pipeline
    (reference: cianparser/flat/list.py:45-69, suburban/list.py:45-69,
    newobject/list.py:66-83) including dict-union precedence.
    """
    kind = rt["kind"]
    f = _blank_offer_fields()
    if kind == "newobject":
        c = extract.parse_newobject_card(card_html)
        _set(f, "name", c["name"])
        _set(f, "location", rt["location"])
        _set(f, "accommodation_type", "newobject")
        _set(f, "url", c["url"])
        _set(f, "full_full_location_address", c["full_full_location_address"])
        _set(f, "deal_url_id", c["url"])  # newobject dedup key = scheme+host
        ids = extract.card_image_ids(card_html)
        _set(f, "image_id", ids[0] if ids else None)
        return f

    url = extract.card_url(card_html)
    _set(f, "url", url)
    _set(f, "location", rt["location"])
    _set(f, "deal_type", rt["deal"])
    _set(f, "accommodation_type", kind)
    _set(f, "deal_url_id", urls.deal_url_id(url))
    a = extract.author(card_html)
    _set(f, "author", a["author"])
    _set(f, "author_type", a["author_type"])
    p = extract.price(card_html)
    _set(f, "price", p.get("price"))
    _set(f, "price_per_month", p.get("price_per_month"))
    f["commissions"] = p.get("commissions", 0)  # 0 is a value, not missing
    if kind == "suburban":
        _set(f, "suburban_type", rt["suburban_type"])
        loc = extract.location_suburban(card_html)
    else:
        s = extract.specification(card_html)
        _set(f, "floor", s["floor"])
        _set(f, "floors_count", s["floors_count"])
        _set(f, "rooms_count", s["rooms_count"])
        _set(f, "total_meters", s["total_meters"])
        loc = extract.location_flat(card_html, rt["is_sale"])
    for k, v in loc.items():
        _set(f, k, v)
    ids = extract.card_image_ids(card_html)
    _set(f, "image_id", ids[0] if ids else None)
    return f


def parse_detail_fields(page_html: str, rt: dict) -> dict:
    kind = rt["kind"]
    if kind == "newobject":
        d = extract.detail_newobject(page_html)
    elif kind == "suburban":
        d = extract.detail_suburban(page_html)
    else:
        d = extract.detail_flat(page_html)
    out = {}
    for k, v in d.items():
        col = "class" if k == "class" else k
        if col in model.OFFER_COLS:
            # detail raw values are strings when present, -1 when absent
            # (the reference keeps them untyped; we type long columns)
            if col in ("floor", "floors_count", "floors_from", "floors_to"):
                if isinstance(v, str):
                    v = int(v) if v.lstrip("-").isdigit() else -1
                out[col] = model.sentinel_to_null(v, col)
            else:
                out[col] = None if v in (-1, "") else str(v)
    return out


def make_fetch_parse(seed_runtimes: dict[int, dict], cfg: webgen.WebConfig):
    """Build the mapInPandas function over frontier rows.

    Input columns: url, kind, host, card_json, seed_id, page_number,
    card_index, attempt, wave.
    """

    def fetch_parse(iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        # per-partition session prologue (one resolver per partition)
        resolver = webgen

        for pdf in iterator:
            out: list[dict] = []
            n_in = len(pdf)
            for r in pdf.itertuples(index=False):
                rt = seed_runtimes[int(r.seed_id)]
                base = _row(
                    row_type="page", fetch_url=r.url, outcome=None,
                    host=r.host, card_json=None, status=None,
                    seed_id=int(r.seed_id), page_number=int(r.page_number),
                    card_index=int(r.card_index), attempt=int(r.attempt),
                    n_cards=None, partition_id=pid, wave=int(r.wave),
                    **_blank_offer_fields(),
                )
                status, html = resolver.fetch(r.url, attempt=int(r.attempt), cfg=cfg)
                base["status"] = status

                if r.kind == "detail":
                    base["row_type"] = "detail_err" if status != 200 else "offer"
                    base["card_json"] = r.card_json
                    if status != 200:
                        base["outcome"] = "http_error"
                        out.append(base)
                        continue
                    card_fields = json.loads(r.card_json)
                    detail_fields = parse_detail_fields(html, rt)
                    # dict-union precedence: detail overrides card
                    # (reference: cianparser/flat/list.py:69 union order)
                    merged = {**card_fields, **detail_fields}
                    base.update({k: merged.get(k) for k in model.OFFER_COLS})
                    base["outcome"] = "ok"
                    out.append(base)
                    continue

                # list page
                if status != 200:
                    base["outcome"] = "http_429" if status == 429 else "http_error"
                    out.append(base)
                    continue
                if extract.has_captcha(html):
                    base["outcome"] = "captcha"
                    out.append(base)
                    continue
                if rt["kind"] != "newobject" and not extract.has_header(html):
                    base["outcome"] = "noheader"
                    out.append(base)
                    continue
                cards = extract.list_page_cards(html, rt["kind"])
                base["outcome"] = "ok"
                base["n_cards"] = len(cards)
                out.append(base)
                for idx, card in enumerate(cards):
                    row = _row(
                        row_type="card", fetch_url=r.url, outcome=None,
                        host=r.host, card_json=None, status=200,
                        seed_id=int(r.seed_id), page_number=int(r.page_number),
                        card_index=idx, attempt=0, n_cards=None,
                        partition_id=pid, wave=int(r.wave),
                        **parse_card_fields(card, rt),
                    )
                    out.append(row)
            pdf_out = pd.DataFrame(out, columns=_ALL_COLS)
            # lineage counts ride along on page rows
            pdf_out.attrs["input_rows"] = n_in
            yield pdf_out

    return fetch_parse
