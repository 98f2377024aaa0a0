"""Field-extraction equality: extractors must recover the exact ground
truth the synthetic web rendered (flat/suburban/newobject list counts +
field extraction equality, per the north star)."""

from cianparser_spark.corpus import webgen as W
from cianparser_spark.semantics import extract, urls


def _page(kind: str, deal: str, page: int = 1, **kw):
    tpl = urls.build_list_url_template("1", deal, kind, **kw)
    url = urls.format_page_url(tpl, page)
    status, html = W.fetch(url, attempt=2)  # attempt 2 skips injected faults
    assert status == 200
    return url, html


def test_flat_sale_card_counts_and_fields():
    url, html = _page("flat", "sale", rooms=(1, 2, "studio"))
    cards = extract.list_page_cards(html, "flat")
    oids = W.page_oids(url)
    assert len(cards) == len(oids) == W.PAGE_SIZE
    for card, oid in zip(cards, oids):
        t = W.offer_truth(oid, "sale", "flat")
        assert urls.deal_url_id(extract.card_url(card)) == str(oid)
        a = extract.author(card)
        assert (a["author"], a["author_type"]) == (t["author"], t["author_type"])
        p = extract.price(card)
        assert p["price"] == t["price"] and p["price_per_month"] == -1
        s = extract.specification(card)
        assert s["total_meters"] == t["total_meters"]
        assert s["floor"] == t["floor"] and s["floors_count"] == t["floors_count"]
        assert s["rooms_count"] == t["rooms_count"]
        loc = extract.location_flat(card, True)
        assert loc["district"] == t["district"]
        assert loc["street"] == t["street"]
        assert loc["house_number"] == t["house_number"]
        assert loc["underground"] == t["underground"]
        if t["with_complex"]:
            assert loc["residential_complex"] == t["complex_name"]
        assert extract.card_image_ids(card) == [t["image_id"]]


def test_flat_rent_price_and_commissions():
    url, html = _page("flat", "rent", rooms="all", rent_period_type=4)
    cards = extract.list_page_cards(html, "flat")
    for card, oid in zip(cards, W.page_oids(url)):
        t = W.offer_truth(oid, "rent", "flat")
        p = extract.price(card)
        assert p["price_per_month"] == t["price"]
        assert p["commissions"] == t["commission"]
        assert "price" not in p


def test_suburban_geolabels():
    url, html = _page("suburban", "sale", suburban_type="house")
    cards = extract.list_page_cards(html, "suburban")
    assert len(cards) == W.PAGE_SIZE
    for card, oid in zip(cards, W.page_oids(url)):
        t = W.offer_truth(oid, "sale", "suburban")
        loc = extract.location_suburban(card)
        assert loc["street"] == t["street"]
        assert loc["house_number"] == t["house_number"]
        assert loc["district"] == f"{t['district']} р-н"
        expected_metro = f"м. {t['underground']}" if t["with_metro"] else ""
        assert loc["underground"] == expected_metro


def test_newobject_cards_and_host_dedup_key():
    url, html = _page("newobject", "sale")
    cards = extract.list_page_cards(html, "newobject")
    assert len(cards) == W.PAGE_SIZE
    for card, oid in zip(cards, W.page_oids(url)):
        t = W.offer_truth(oid, "sale", "newobject")
        c = extract.parse_newobject_card(card)
        assert c["name"] == f"ЖК «{t['complex_name']}»"
        # key = scheme+host only (reference: newobject/list.py:71)
        assert c["url"] == f"https://zhk-{t['complex_slug']}-{oid}.cian.ru"


def test_detail_pages_all_kinds():
    oid = W.page_oids(_page("flat", "sale", rooms=1)[0])[0]
    t = W.offer_truth(oid, "sale", "flat")
    _, html = W.fetch(f"https://cian.ru/sale/flat/{oid}/", attempt=2)
    d = extract.detail_flat(html)
    assert d["object_type"] == t["object_type"]
    assert d["house_material_type"] == t["house_material_type"]
    assert d["year_of_construction"] == str(t["year_of_construction"])
    assert (d["floor"], d["floors_count"]) == (t["floor"], t["floors_count"])
    assert d["phone"] == t["phone_expected"]

    _, html = W.fetch(f"https://cian.ru/sale/suburban/{oid}/", attempt=2)
    ts = W.offer_truth(oid, "sale", "suburban")
    ds = extract.detail_suburban(html)
    assert ds["land_plot"] == ts["land_plot"]
    assert ds["gas_type"] == ts["gas_type"]
    assert ds["floors_count"] == str(ts["floors_count"])

    tn = W.offer_truth(oid, "sale", "newobject")
    _, html = W.fetch(f"https://zhk-{tn['complex_slug']}-{oid}.cian.ru", attempt=2)
    dn = extract.detail_newobject(html)
    assert dn["builder"] == f"Застройщик {tn['builder_name']}"
    assert (dn["floors_from"], dn["floors_to"]) == (tn["floors_from"], tn["floors_to"])
    assert dn["class"] == tn["nclass"]


def test_rooms_count_cascade():
    assert extract.rooms_count("Студия, 25 м²") == 1
    assert extract.rooms_count("1-комн. кв.") == 1
    assert extract.rooms_count("4-комн. апартаменты") == 4
    assert extract.rooms_count("гараж") == -1


def test_captcha_and_header_probes():
    assert extract.has_captcha(W.CAPTCHA_HTML)
    ok = W.render_list_page(
        urls.format_page_url(urls.build_list_url_template("1", "sale", "flat"), 1)
    )
    assert not extract.has_captcha(ok)
    assert extract.has_header(ok)
    assert not extract.has_header(
        W.render_list_page(
            urls.format_page_url(urls.build_list_url_template("1", "sale", "flat"), 1),
            with_header=False,
        )
    )


def test_price_parse_quirks():
    # commission slice is [find('%')-2 : find('%')] (helpers.py:284-285)
    card = (
        '<article data-name="CardComponent"><div data-name="LinkArea">'
        '<span data-mark="MainPrice">45 000 ₽/мес, комиссия 50%</span>'
        "</div></article>"
    )
    p = extract.price(card)
    assert p["price_per_month"] == 45000 and p["commissions"] == 50
    # млн prices are skipped by the reference (helpers.py:289)
    card2 = card.replace("45 000 ₽/мес, комиссия 50%", "4,5 млн ₽")
    p2 = extract.price(card2)
    assert p2 == {"price_per_month": -1, "commissions": 0}


def test_adjacent_page_duplicates_exist():
    tpl = urls.build_list_url_template("1", "sale", "flat")
    p1 = W.page_oids(urls.format_page_url(tpl, 1))
    p2 = W.page_oids(urls.format_page_url(tpl, 2))
    assert set(p1) & set(p2), "dup injection should overlap adjacent pages"


def test_site_page_cap():
    tpl = urls.build_list_url_template("1", "sale", "flat")
    assert W.page_oids(urls.format_page_url(tpl, W.SITE_PAGE_CAP + 1)) == []
