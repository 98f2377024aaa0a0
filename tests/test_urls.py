"""URL compiler golden tests (reference grammar equality)."""

import pytest

from cianparser_spark.semantics import urls


def test_golden_url_from_reference_readme():
    # exact string the reference prints for get_flats(deal_type="sale",
    # rooms=(1,2)) in Москва (reference: README.md:27)
    tpl = urls.build_list_url_template("1", "sale", "flat", rooms=(1, 2))
    assert (
        urls.format_page_url(tpl, 1)
        == "https://cian.ru/cat.php?engine_version=2&p=1&with_neighbors=0"
        "&region=1&deal_type=sale&offer_type=flat&room1=1&room2=1"
    )


def test_rooms_variants():
    assert urls.rooms_params(1) == "&room1=1"
    assert urls.rooms_params("studio") == "&room9=1"
    assert urls.rooms_params("all") == ""
    assert urls.rooms_params((1, 3, "studio")) == "&room1=1&room3=1&room9=1"
    # invalid values silently dropped (reference: url_builder.py:28-47)
    assert urls.rooms_params((0, 6, "penthouse")) == ""
    assert urls.rooms_params(7) == ""


def test_deal_type_rewrite():
    assert urls.rewrite_deal_type("rent_long") == ("rent", 4)
    assert urls.rewrite_deal_type("rent_short") == ("rent", 2)
    assert urls.rewrite_deal_type("sale") == ("sale", None)


def test_rent_url_includes_period_type():
    tpl = urls.build_list_url_template("1", "rent", "flat", rooms=2, rent_period_type=4)
    assert "&deal_type=rent" in tpl and "&type=4" in tpl and "&room2=1" in tpl


def test_suburban_and_newobject_paths():
    sub = urls.build_list_url_template("4777", "sale", "suburban", suburban_type="townhouse")
    assert "/cat.php?" in sub and "&object_type%5B0%5D=4" in sub
    new = urls.build_list_url_template("1", "sale", "newobject")
    assert new.startswith("https://cian.ru/newobjects/list/?engine_version=2&p={}")


def test_additional_settings_order_and_formats():
    tpl = urls.build_list_url_template(
        "1", "sale", "flat",
        additional_settings={
            "max_price": 10_000_000,
            "min_price": 1_000_000,
            "is_by_homeowner": True,
            "min_floor": 2,
            "sort_by": "price_from_min_to_max",
            "metro": "Московский",
            "metro_station": "Бауманская",
        },
    )
    # serialization order is fixed by the grammar regardless of dict order
    # (reference: url_builder.py:55-120)
    tail = tpl.split("&offer_type=flat")[1]
    assert tail == (
        "&is_by_homeowner=1&minprice=1000000&maxprice=10000000&minfloor=2"
        "&metro%5B0%5D=13&sort=price_object_order"
    )


def test_deal_url_id_quirks():
    # (reference: cianparser/helpers.py:27-34)
    assert urls.deal_url_id("https://cian.ru/sale/flat/123456789/") == "123456789"
    assert urls.deal_url_id("https://cian.ru/sale/flat/123456789") == "123456789"
    assert urls.deal_url_id("a/b") == "-1"
    assert urls.deal_url_id("ab/c/") == "-1"
    # trailing slash → last segment "" → falls back to penultimate
    assert urls.deal_url_id("x/pen_ultimate/") == "pen_ultimate"


def test_unknown_location_raises():
    # deliberate fix of the reference's never-raised ValueError
    # (reference: cianparser/cianparser.py:184-186)
    from cianparser_spark.dims import location_id

    with pytest.raises(ValueError):
        location_id("Нарния")
    assert location_id("Москва") == "1"


def test_validation():
    with pytest.raises(ValueError):
        urls.validate_flats_args("buy", 1)
    with pytest.raises(ValueError):
        urls.validate_flats_args("sale", 6)
    with pytest.raises(ValueError):
        urls.validate_flats_args("sale", (1, "loft"))
    urls.validate_flats_args("sale", (1, 5, "studio"))
    urls.validate_flats_args("rent_long", "all")
    with pytest.raises(ValueError):
        urls.validate_suburban_args("castle", "sale")


def test_full_city_table_vendored():
    """Every reference city resolves (constants.py:69-175); spot-check
    golden URLs for several non-Moscow cities."""
    from cianparser_spark import dims

    assert len(dims.CITIES) == 105
    assert len(dims.OTHER_CITIES) == 51
    for city, rid in (("Тула", "5020"), ("Сочи", "4998"), ("Калуга", "4780"),
                      ("Владивосток", "4701")):
        assert dims.location_id(city) == rid, city
        tpl = urls.build_list_url_template(rid, "sale", "flat", rooms=1)
        assert urls.format_page_url(tpl, 2) == (
            "https://cian.ru/cat.php?engine_version=2&p=2&with_neighbors=0"
            f"&region={rid}&deal_type=sale&offer_type=flat&room1=1"
        )


def test_full_metro_table_vendored():
    from cianparser_spark import dims

    assert sum(len(v) for v in dims.METRO_STATIONS.values()) == 510
    assert set(dims.METRO_STATIONS) == {
        "Московский", "Казанский", "Петербургский", "Самарский",
        "Екатеринбургский", "Новосибирский", "Нижегородский"}
    # metro filter pushes the station id into the URL
    # (reference: url_builder.py:89-94 + constants METRO_ID_PATH)
    mid = dims.metro_station_id("Московский", "Таганская")
    assert mid is not None
    tpl = urls.build_list_url_template(
        "1", "sale", "flat", rooms=1,
        additional_settings={"metro": "Московский", "metro_station": "Таганская"})
    assert f"&metro%5B0%5D={mid}" in urls.format_page_url(tpl, 1)


def test_canonical_url_expr_matches_python(spark):
    """The native canonicalization expression must equal the pure-
    Python urllib reference on the contract's messy families plus
    hand-picked edge cases (U9 / frontier seen-key function)."""
    from cianparser_spark.ops.urlnorm import (
        canonical_url_expr, canonicalize_url, messy_url_py)

    cases = [messy_url_py(k) for k in range(1, 9)] + [
        "https://cian.ru/",
        "https://cian.ru",
        "http://CIAN.RU:80",
        "https://cian.ru:8443/a//b///c?b=2&a=1&a=0#x",
        "http://cian.ru/cat.php?",
        "https://cian.ru/path#only-frag",
        "HTTPS://Cian.Ru:443//cat.php?p=1",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["canon"] for r in
           df.select("url", canonical_url_expr("url").alias("canon")).collect()}
    for u in cases:
        assert got[u] == canonicalize_url(u), u


def test_canonical_url_hash_collapses_variants(spark):
    """All spellings of one logical URL map to ONE seen-set key."""
    from cianparser_spark.ops.urlnorm import canonical_url_hash

    variants = [
        "https://cian.ru/cat.php?p=2&deal_type=sale",
        "HTTPS://CIAN.RU:443//cat.php?deal_type=sale&p=2#list",
        "https://Cian.ru/cat.php?deal_type=sale&p=2",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    keys = {r["k"] for r in df.select(canonical_url_hash("url").alias("k")).collect()}
    assert len(keys) == 1


def test_list_url_expr_matches_python_builder(spark):
    """The Catalyst-native URL compiler (urls.list_url_expr) must equal
    the Python builder string-for-string on the 220 pinned grammar
    configs (valid/invalid rooms, deal rewrites, every settings key,
    unknown metro/sort keys) — the same pairing the driver's
    u1_url_builder contract row checks."""
    from pyspark.sql import functions as F

    from cianparser_spark import dims, truth
    from cianparser_spark.semantics import urls

    pdf_path = truth.ensure_url_grammar_truth()
    params = spark.read.parquet(pdf_path)
    seen = {}
    for net, pairs in dims.METRO_STATIONS.items():
        for st, mid in pairs:
            seen.setdefault((net, st), mid)
    mdim = spark.createDataFrame(
        [(net, st, mid) for (net, st), mid in seen.items()],
        "metro string, metro_station string, metro_id string")
    got = (
        params.join(F.broadcast(mdim), ["metro", "metro_station"], "left")
        .select("cfg_id", urls.list_url_expr().alias("url"), "golden")
        .collect()
    )
    assert len(got) == 220
    for r in got:
        assert r["url"] == r["golden"], (r["cfg_id"], r["url"], r["golden"])


def test_politeness_schedule_closed_form(spark, tmp_run_dir):
    """T5: on the fault-free list-only config, the engine's wave
    schedule equals ceil(rank/budget) over the (page_number, seed_id)
    priority — the closed form the DuckDB window-SQL oracle re-derives."""
    from pyspark.sql import functions as F

    from cianparser_spark import truth
    from cianparser_spark.engine.crawler import CrawlEngine

    seeds, cfg = truth.politeness_seeds_and_cfg()
    eng = CrawlEngine(spark, tmp_run_dir, seeds, cfg,
                      host_tokens=truth.T5_HOST_TOKENS)
    eng.run()
    got = {
        (r["seed_id"], r["page_number"]): r["wave"]
        for r in eng.store.read("frontier").filter(F.col("kind") == "list")
        .groupBy("seed_id", "page_number").agg(F.max("wave").alias("wave"))
        .collect()
    }
    pages = sorted(
        ((p, s.seed_id) for s in seeds
         for p in range(s.pages()[0], s.pages()[1] + 1)))
    expect = {
        (sid, p): 1 + i // truth.T5_HOST_TOKENS
        for i, (p, sid) in enumerate(pages)
    }
    assert got == expect


def test_politeness_pages_all_full():
    """The lineage_waves oracle multiplies pages × PAGE_SIZE, which is
    only valid if no fetched page is its query's LAST (partial) page —
    pin that property of the pinned t5 config."""
    from cianparser_spark import truth
    from cianparser_spark.corpus import webgen
    from cianparser_spark.semantics import urls

    seeds, cfg = truth.politeness_seeds_and_cfg()
    for s in seeds:
        template = s.url_template()
        start, end = s.pages()
        for p in range(start, end + 1):
            oids = webgen.page_oids(urls.format_page_url(template, p), cfg)
            assert len(oids) == webgen.PAGE_SIZE, (s.seed_id, p, len(oids))
