"""Definer pipelines (S9): id-discovery crawls for cities and metro
stations.

The reference ships two standalone utilities that probe a numeric id
range against the site, parse one field per page, first-wins dedup,
sort, and write a header-less CSV:

* cities — reference: cianparser/definers/definer_cities_id.py:29-91
  probes ``region={id}``, mines the HeaderDefault title, extracts the
  city between "снять квартиру в " and " на длительный срок", rejects
  region-level titles (области/крае/республике/… substrings, "в
  России", missing "АрендаСнять"), keeps the FIRST id per city name,
  sorts by name.
* metro — reference: cianparser/definers/definer_metro_id.py:29-103
  probes ``metro[0]={id}`` under region=1, takes the second
  GeneralInfoSectionRowComponent address (or the first containing
  ", м."), detects the city by membership of 7 known names, extracts
  the station after ", м. ", keeps the first id per station, sorts by
  city.

Spark-first shape: the probe range is ``spark.range`` partitioned
across executors; the ONLY Python is the fetch itself (one narrow
mapInPandas kernel returning ``(id, raw text)``), exactly like the
crawl engine's fetch stage.  Extraction, the reject cascade, first-wins
(``min(id)`` per name — the reference scans ids ascending, so its
set-based first-wins IS the min), and the final sort are all native
Catalyst expressions: at definer scale (thousands of probes) one tiny
shuffle; at any scale, still one shuffle on the name key.

Deviations (documented):
* the reference sleeps 2 s per probe (definer_cities_id.py:70) — the
  engine's politeness model is the per-host token budget; definer
  probes are bounded one-shot GETs, run at partition parallelism.
* the reference normalizes the prepositional-case city via pymorphy2
  (definer_cities_id.py:52-53).  Implemented (round 4) as a scoped
  rule-based stand-in: semantics/morphru.py generates each vocabulary
  city's prepositional form and ``_normal_form_col`` compiles the
  reverse lookup into one literal-map Catalyst expression (identity
  fallback).  The synthetic site renders nominative titles by default
  (normalization = identity, as before);
  ``WebConfig.inflect_city_headers`` renders the real site's
  prepositional titles, exercised end-to-end by the
  ``s9_definer_cities_inflected`` contract query.  Out of scope
  (documented): pymorphy2's general-vocabulary lemmatization — the
  definer only ever normalizes city names, which the vocabulary map
  covers exactly.
* the reference re-writes the whole CSV after every discovery
  (save_results inside the loop) — an O(n²) incremental-save tic; the
  Spark job writes once at the end.  Its quirk of building a header
  row and then NOT writing it (definer_cities_id.py:76-91 constructs
  ``cities_result`` with a header namedtuple but writes ``self.cities``)
  is preserved: the CSV has no header.
"""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cianparser_spark.corpus import webgen
from cianparser_spark.semantics import html as H

# the reference's probe URL shapes (definer_cities_id.py:66,
# definer_metro_id.py:75) on the synthetic host
CITY_PROBE_URL = (
    "https://cian.ru/cat.php?deal_type=rent&engine_version=2"
    "&offer_type=flat&p=1&region={id}&type=4"
)
METRO_PROBE_URL = (
    "https://cian.ru/cat.php?deal_type=rent&engine_version=2"
    "&offer_type=flat&p=1&region=1&type=4&metro[0]={id}"
)

# reference reject substrings, checked on the lowercased extracted city
# (definer_cities_id.py:40-48)
CITY_REJECT_SUBSTRINGS = (
    "области", "крае", "республике", "округе", "россии",
    "кабардино", "карачаево", "дагестан", "осетии",
    "ненецком ао", "ямало-ненецком ао", "чукотском ао",
    "ханты-мансийском ао", "чувашии",
)

# reference city-detection list, in its if-chain order
# (definer_metro_id.py:46-60)
METRO_CITIES = (
    "Москва", "Казань", "Санкт-Петербург", "Самара",
    "Екатеринбург", "Новосибирск", "Нижний Новгород",
)


def probe_city_title(region_id: int, cfg: webgen.WebConfig) -> str | None:
    """One city probe: GET + HeaderDefault text, or None (non-200 /
    captcha / header-less page — the definer's empty-``offers`` skip).
    Single-shot like the reference's bare requests.get (no retry)."""
    status, page = webgen.fetch(CITY_PROBE_URL.format(id=region_id), 0, cfg)
    if status != 200 or page.find("Captcha") > 0:
        return None
    block = H.first_block(page, "div", "data-name", "HeaderDefault")
    return None if block is None else H.text(block)


def probe_metro_address(metro_id: int, cfg: webgen.WebConfig) -> str | None:
    """One metro probe: the second GeneralInfoSectionRowComponent text,
    falling back to the first one containing ", м." (reference:
    definer_metro_id.py:33-41); None when the page has < 2 rows."""
    status, page = webgen.fetch(METRO_PROBE_URL.format(id=metro_id), 0, cfg)
    if status != 200 or page.find("Captcha") > 0:
        return None
    texts = [H.text(b) for b in
             H.blocks(page, "div", "data-name", "GeneralInfoSectionRowComponent")]
    if len(texts) < 2:
        return None
    address = texts[1]
    if ", м." not in address:
        for t in texts:
            if ", м." in t:
                address = t
                break
    return address


def _probe_df(spark: SparkSession, start_id: int, end_id: int,
              cfg: webgen.WebConfig, probe, out_col: str,
              num_partitions: int | None = None) -> DataFrame:
    """spark.range over the probe ids → narrow fetch kernel.

    Each partition is an independent batch of one-shot GETs — the
    definer analog of the crawl engine's fetch stage (engine/stage.py).
    """
    n_part = num_partitions or min(
        spark.sparkContext.defaultParallelism, max(1, (end_id - start_id + 1) // 8))
    ids = spark.range(start_id, end_id + 1, numPartitions=n_part)

    def kernel(batches):
        for pdf in batches:
            vals = [probe(int(i), cfg) for i in pdf["id"]]
            yield pd.DataFrame({"probe_id": pdf["id"].astype("int64"),
                                out_col: pd.array(vals, dtype=object)})

    return ids.mapInPandas(kernel, f"probe_id long, {out_col} string")


def _normal_form_col(city_col):
    """The reference's pymorphy2 normal-form step
    (definer_cities_id.py:52-54) as ONE Catalyst expression: a literal
    ``create_map`` over the city vocabulary's (lowercased observed
    form → nominative) pairs — both the prepositional and the
    nominative spelling of every known city (semantics/morphru.py, the
    scoped pymorphy2 stand-in) — with identity fallback.  Zero jobs,
    zero Python: at definer scale the whole normalization is a map
    probe inside codegen; on nominative-rendering sites it reduces to
    the identity exactly like the reference's normal_form does.  The
    reference's trailing ``.title()`` re-casing is deliberately NOT
    reproduced (it would emit 'Ростов-На-Дону' against the vocabulary's
    'Ростов-на-Дону' — the reference's own constants.py:141 disagrees
    with its definer there); see semantics/morphru.py's documented
    deviation."""
    from cianparser_spark.semantics import morphru

    m = morphru.city_normal_map(morphru.default_vocab())
    pairs = []
    for k, v in sorted(m.items()):
        pairs += [F.lit(k), F.lit(v)]
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.lower(city_col)), city_col)


def city_rows(raw: DataFrame) -> DataFrame:
    """Catalyst reject cascade + extraction + case normalization over
    raw probe titles → ``(location_name, city_id)`` accepted rows
    (pre-dedup)."""
    # the reference lowercases the title and searches "снять квартиру в "
    # (definer_cities_id.py:37-38); Java regex (?i) is ASCII-only, so we
    # anchor on the case-stable tail of the marker instead — matches the
    # same span on every title the synthetic site serves
    city = F.regexp_extract(
        "title", r"нять квартиру в (.+?) на длительный срок", 1)
    reject = F.col("title").isNull()
    reject = reject | ~F.col("title").contains("АрендаСнять")
    reject = reject | F.col("title").contains("в России")
    lc = F.lower(city)
    for sub in CITY_REJECT_SUBSTRINGS:
        reject = reject | lc.contains(sub)
    # reject cascade runs on the RAW extracted (possibly inflected)
    # city, THEN normalization — the reference's exact order
    # (rejects :40-48 precede normal_form :52)
    return (
        raw.withColumn("location_name", city)
        .filter(~reject & (F.col("location_name") != ""))
        .select(_normal_form_col(F.col("location_name")).alias("location_name"),
                F.col("probe_id").alias("city_id"))
    )


def define_cities(spark: SparkSession, start_id: int, end_id: int,
                  cfg: webgen.WebConfig = webgen.DEFAULT_CONFIG,
                  num_partitions: int | None = None) -> DataFrame:
    """The cities definer as one declarative plan: probe → extract →
    reject → first-wins (min id per name) → ORDER BY name."""
    raw = _probe_df(spark, start_id, end_id, cfg, probe_city_title,
                    "title", num_partitions)
    return (
        city_rows(raw)
        .groupBy("location_name")
        .agg(F.min("city_id").alias("city_id"))
        .orderBy("location_name")
    )


def metro_rows(raw: DataFrame) -> DataFrame:
    """Catalyst extraction over raw probe addresses → ``(city,
    metro_name, metro_id)`` accepted rows (pre-dedup).

    The reference's sequential if-chain is last-match-wins; synthetic
    addresses contain exactly one city name, so an equivalent
    first-match ``when`` cascade compiles to a single codegen span."""
    city = F.lit("Unknown")
    cascade = None
    for name in METRO_CITIES:
        cond = F.col("address").contains(name)
        cascade = F.when(cond, name) if cascade is None else cascade.when(cond, name)
    city = cascade.otherwise("Unknown")
    metro = F.regexp_extract("address", r", м\. ([^,]*)", 1)
    return (
        raw.filter(F.col("address").isNotNull() & F.col("address").contains(", м."))
        .select(city.alias("city"), metro.alias("metro_name"),
                F.col("probe_id").alias("metro_id"))
    )


def define_metro(spark: SparkSession, start_id: int, end_id: int,
                 cfg: webgen.WebConfig = webgen.DEFAULT_CONFIG,
                 num_partitions: int | None = None) -> DataFrame:
    """The metro definer: probe → address extract → first-wins per
    station name → ORDER BY (city, metro_id).

    The reference sorts by city only (Python stable sort), which keeps
    discovery order — ascending probe id — within a city; ``min(id)``
    per name + the explicit metro_id tiebreak reproduces that exactly.
    """
    raw = _probe_df(spark, start_id, end_id, cfg, probe_metro_address,
                    "address", num_partitions)
    rows = metro_rows(raw)
    first = (
        rows.groupBy("metro_name")
        .agg(F.min("metro_id").alias("metro_id"))
    )
    return (
        rows.join(first, ["metro_name", "metro_id"], "left_semi")
        .select("city", "metro_name", "metro_id")
        .orderBy("city", "metro_id")
    )


def save_definer_csv(df: DataFrame, out_dir: str, filename: str) -> str:
    """Write the reference-shaped CSV: ONE file, comma-separated,
    QUOTE_MINIMAL, NO header (the reference builds a header row and
    then never writes it — definer_cities_id.py:76-91).  Definer output
    is bounded (≤ a few thousand discovered names), so coalesce(1) is
    a documented small-result sink, not a pipeline pattern."""
    tmp = os.path.join(out_dir, f"_{filename}.spark")
    (df.coalesce(1).write.mode("overwrite")
       .option("header", "false").option("quoteAll", "false").csv(tmp))
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    final = os.path.join(out_dir, filename)
    shutil.move(part, final)
    shutil.rmtree(tmp, ignore_errors=True)
    return final
