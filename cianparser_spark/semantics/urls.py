"""URL query compiler — builds the reference's exact list-page URL grammar.

The reference compiles a user query (location, deal type, rooms,
filters, sort) into ONE list-page URL template with a ``p={}`` hole for
the page number; every search predicate is *pushed down* to the remote
source as a query parameter (reference: cianparser/url_builder.py:4-120,
orchestration cianparser/cianparser.py:232-251, grammar constants
cianparser/constants.py:15-58).  Parameter ORDER is part of the grammar
(tests assert exact string equality), so we encode it as an ordered
spec table instead of the reference's imperative append chain.

This module is pure Python: it runs driver-side when planning a crawl
and inside Arrow UDF batches when a worker needs to materialize page
URLs (``format_page_url``).
"""

from __future__ import annotations

from cianparser_spark.dims import metro_station_id

BASE_URL = "https://cian.ru"
LIST_PATH = "/cat.php?"
NEWOBJECT_PATH = "/newobjects/list/?"
PAGE_CORE = "engine_version=2&p={}&with_neighbors=0"

# suburban object kind -> site code (reference: cianparser/constants.py:2)
SUBURBAN_TYPES = {"house": "1", "house-part": "2", "land-plot": "3", "townhouse": "4"}
# flat market segment -> site code (reference: cianparser/constants.py:3)
OBJECT_TYPES = {"secondary": "1", "new": "2"}

DEAL_TYPES = {"rent_long", "sale"}

# user-facing sort key -> pushed-down &sort= value
# (reference: cianparser/constants.py:48-58, url_builder.py:110-120)
SORT_BY = {
    "price_from_min_to_max": "price_object_order",
    "price_from_max_to_min": "total_price_desc",
    "total_meters_from_max_to_min": "area_order",
    "creation_data_from_newer_to_older": "creation_date_desc",
    "creation_data_from_older_to_newer": "creation_date_asc",
}

# additional_settings serialization order and formats; order is load-bearing
# (reference: cianparser/url_builder.py:55-120 top-to-bottom)
_SETTING_SPECS: list[tuple[str, str, str]] = [
    # (settings key, kind, format)
    ("object_type", "mapped", "&object_type%5B0%5D={}"),
    ("is_by_homeowner", "flag", "&is_by_homeowner=1"),
    ("min_balconies", "value", "&min_balconies={}"),
    ("have_loggia", "flag", "&loggia=1"),
    ("min_house_year", "value", "&min_house_year={}"),
    ("max_house_year", "value", "&max_house_year={}"),
    ("min_price", "value", "&minprice={}"),
    ("max_price", "value", "&maxprice={}"),
    ("min_floor", "value", "&minfloor={}"),
    ("max_floor", "value", "&maxfloor={}"),
    ("min_total_floor", "value", "&minfloorn={}"),
    ("max_total_floor", "value", "&maxfloorn={}"),
    ("house_material_type", "value", "&house_material%5B0%5D={}"),
    ("metro", "metro", "&metro%5B0%5D={}"),
    ("metro_foot_minute", "value", "&only_foot=2&foot_min={}"),
    ("flat_share", "value", "&flat_share={}"),
    ("only_flat", "flag", "&only_flat=1"),
    ("only_apartment", "flag", "&apartment=1"),
    ("sort_by", "sort", "&sort={}"),
]


def rewrite_deal_type(deal_type: str) -> tuple[str, int | None]:
    """User deal type -> (site deal param, rent period code).

    (reference: cianparser/cianparser.py:254-260)
    """
    if deal_type == "rent_long":
        return "rent", 4
    if deal_type == "rent_short":
        return "rent", 2
    return deal_type, None


def rooms_params(rooms) -> str:
    """Room selection -> repeated ``&roomN=1`` params on ONE url.

    studio -> room9; "all" or invalid values -> silently nothing
    (reference: cianparser/url_builder.py:28-47).  No URL fan-out: a
    single list URL carries every selected room count.
    """
    parts: list[str] = []

    def one(r) -> None:
        if isinstance(r, bool):  # bool is an int subclass; reject explicitly
            return
        if isinstance(r, int) and 0 < r < 6:
            parts.append(f"&room{r}=1")
        elif isinstance(r, str) and r == "studio":
            parts.append("&room9=1")

    if isinstance(rooms, tuple):
        for r in rooms:
            one(r)
    else:
        one(rooms)
    return "".join(parts)


def settings_params(settings: dict) -> str:
    """Serialize additional_settings in the grammar's fixed order."""
    parts: list[str] = []
    for key, kind, fmt in _SETTING_SPECS:
        if key not in settings:
            continue
        val = settings[key]
        if kind == "flag":
            if val:
                parts.append(fmt)
        elif kind == "value":
            parts.append(fmt.format(val))
        elif kind == "mapped":
            parts.append(fmt.format(OBJECT_TYPES[val]))
        elif kind == "metro":
            station = settings.get("metro_station")
            if station is not None:
                mid = metro_station_id(val, station)
                if mid is not None:
                    parts.append(fmt.format(mid))
        elif kind == "sort":
            sort = SORT_BY.get(val)
            if sort is not None:
                parts.append(fmt.format(sort))
    return "".join(parts)


def build_list_url_template(
    location_id: str,
    deal_type: str,
    accommodation_type: str,
    rooms=None,
    rent_period_type: int | None = None,
    suburban_type: str | None = None,
    additional_settings: dict | None = None,
) -> str:
    """Compile the query to the paginated list-URL template.

    Returns the template with a literal ``{}`` page hole, byte-identical
    to the reference's construction (reference:
    cianparser/cianparser.py:232-251 + url_builder.py).
    """
    path = NEWOBJECT_PATH if accommodation_type == "newobject" else LIST_PATH
    url = BASE_URL + path + PAGE_CORE
    url += f"&region={location_id}"
    url += f"&deal_type={deal_type}"
    url += f"&offer_type={accommodation_type}"
    if rooms is not None:
        url += rooms_params(rooms)
    if rent_period_type is not None:
        url += f"&type={rent_period_type}"
    if suburban_type is not None:
        url += f"&object_type%5B0%5D={SUBURBAN_TYPES[suburban_type]}"
    if additional_settings:
        url += settings_params(additional_settings)
    return url


def format_page_url(template: str, page_number: int) -> str:
    """Fill the ``p={}`` hole (reference: cianparser/cianparser.py:47)."""
    return template.format(page_number)


def deal_url_id(url: str) -> str:
    """Canonical offer key derived from the offer URL.

    Last path segment if longer than 3 chars, else the second-to-last,
    else "-1"; note a trailing slash makes the last segment "" so the
    id comes from the penultimate segment
    (reference: cianparser/helpers.py:27-34).
    """
    parts = url.split("/")
    if len(parts[-1]) > 3:
        return parts[-1]
    if len(parts) > 1 and len(parts[-2]) > 3:
        return parts[-2]
    return "-1"


def url_host(url: str) -> str:
    """scheme+host canonical form used as the newobject dedup key
    (reference: cianparser/newobject/list.py:71 via urllib.parse)."""
    from urllib.parse import urlparse

    return urlparse(url).netloc


def validate_flats_args(deal_type: str, rooms) -> None:
    """(reference: cianparser/cianparser.py:191-219)"""
    if deal_type not in DEAL_TYPES:
        raise ValueError(
            f'You entered deal_type={deal_type}, which is not a valid value. '
            f'Try one of: "rent_long", "sale".'
        )
    allowed_msg = 'Try one of: 1, 2, 3, 4, 5, "studio", "all".'
    if isinstance(rooms, tuple):
        for r in rooms:
            if isinstance(r, bool) or not isinstance(r, (int, str)):
                raise ValueError(
                    'Invalid element type in "rooms" tuple; int and str are '
                    'accepted, e.g. (1, 3, 5, "studio").'
                )
            if isinstance(r, int) and not 1 <= r <= 5:
                raise ValueError(f"You entered {r} in {rooms}. {allowed_msg}")
            if isinstance(r, str) and r != "studio":
                raise ValueError(f"You entered {r} in {rooms}. {allowed_msg}")
    elif isinstance(rooms, bool):
        raise ValueError('Invalid type for "rooms"; int, str or tuple accepted.')
    elif isinstance(rooms, int):
        if not 1 <= rooms <= 5:
            raise ValueError(f"You entered rooms={rooms}. {allowed_msg}")
    elif isinstance(rooms, str):
        if rooms not in ("studio", "all"):
            raise ValueError(f"You entered rooms={rooms}. {allowed_msg}")
    else:
        raise ValueError('Invalid type for "rooms"; int, str or tuple accepted.')


def validate_suburban_args(suburban_type: str, deal_type: str) -> None:
    """(reference: cianparser/cianparser.py:222-229)"""
    if suburban_type not in SUBURBAN_TYPES:
        raise ValueError(
            f"You entered suburban_type={suburban_type}, which is not valid. "
            f'Try one of: "house", "house-part", "land-plot", "townhouse".'
        )
    if deal_type not in DEAL_TYPES:
        raise ValueError(
            f'You entered deal_type={deal_type}, which is not valid. '
            f'Try one of: "rent_long", "sale".'
        )


# --------------------------------------------------- Catalyst-native twin

def list_url_expr():
    """The URL compiler as ONE native Catalyst expression — the
    JVM-side twin of ``build_list_url_template`` + ``rewrite_deal_type``
    + ``format_page_url`` (reference grammar:
    cianparser/url_builder.py:4-120, cianparser/cianparser.py:232-251).

    Why it exists at scale: a 10^6-query frontier arrives as a
    DATAFRAME of crawl configs, not a driver-side seed list — the URL
    grammar must run inside the plan (whole-stage codegen, zero Python)
    or the driver becomes the compiler bottleneck.  The engine's
    per-seed driver path (``CrawlSeed.url_template``) stays the
    convenience API; this expression is the fan-out path.

    Operates on a config row with columns: location_id, deal_type,
    accommodation_type, rooms (array<string> of room tokens, null =
    no rooms clause), suburban_type, page, metro_id (the pre-joined
    (metro, metro_station) -> id lookup, null = no metro clause —
    J3's lookup expressed as a broadcast join of the vendored dim),
    plus one nullable column per additional_settings key.  Invalid
    room tokens are dropped silently and an unknown sort key emits
    nothing, exactly like the reference (url_builder.py:28-47,110-120).
    Parameter ORDER is the grammar's (load-bearing; tests assert string
    equality against the Python builder on randomized configs)."""
    from pyspark.sql import functions as F

    c = F.col
    deal = F.when(c("deal_type").isin("rent_long", "rent_short"),
                  F.lit("rent")).otherwise(c("deal_type"))
    rent_period = (
        F.when(c("deal_type") == "rent_long", F.lit("&type=4"))
        .when(c("deal_type") == "rent_short", F.lit("&type=2"))
        .otherwise(F.lit(""))
    )
    path = F.when(c("accommodation_type") == "newobject",
                  F.lit(NEWOBJECT_PATH)).otherwise(F.lit(LIST_PATH))
    rooms = F.when(
        c("rooms").isNotNull(),
        F.concat_ws("", F.transform(
            F.filter(c("rooms"),
                     lambda r: r.isin("1", "2", "3", "4", "5", "studio")),
            lambda r: F.concat(
                F.lit("&room"),
                F.when(r == "studio", F.lit("9")).otherwise(r),
                F.lit("=1")),
        )),
    ).otherwise(F.lit(""))
    sub_code = None
    for k, v in SUBURBAN_TYPES.items():
        sub_code = (F.when(c("suburban_type") == k, F.lit(v)) if sub_code is None
                    else sub_code.when(c("suburban_type") == k, F.lit(v)))
    suburban = F.when(
        c("suburban_type").isNotNull(),
        F.concat(F.lit("&object_type%5B0%5D="), sub_code),
    ).otherwise(F.lit(""))

    def val(key: str, fmt: str):
        pre, _, post = fmt.partition("{}")
        return F.when(c(key).isNotNull(),
                      F.concat(F.lit(pre), c(key).cast("string"), F.lit(post))
                      ).otherwise(F.lit(""))

    def flag(key: str, fmt: str):
        return F.when(c(key) == True, F.lit(fmt)).otherwise(F.lit(""))  # noqa: E712

    obj_code = (F.when(c("object_type") == "secondary", F.lit("1"))
                .when(c("object_type") == "new", F.lit("2")))
    sort_code = None
    for k, v in SORT_BY.items():
        sort_code = (F.when(c("sort_by") == k, F.lit(v)) if sort_code is None
                     else sort_code.when(c("sort_by") == k, F.lit(v)))
    # _SETTING_SPECS order, transliterated 1:1
    settings = [
        F.when(c("object_type").isNotNull(),
               F.concat(F.lit("&object_type%5B0%5D="), obj_code)
               ).otherwise(F.lit("")),
        flag("is_by_homeowner", "&is_by_homeowner=1"),
        val("min_balconies", "&min_balconies={}"),
        flag("have_loggia", "&loggia=1"),
        val("min_house_year", "&min_house_year={}"),
        val("max_house_year", "&max_house_year={}"),
        val("min_price", "&minprice={}"),
        val("max_price", "&maxprice={}"),
        val("min_floor", "&minfloor={}"),
        val("max_floor", "&maxfloor={}"),
        val("min_total_floor", "&minfloorn={}"),
        val("max_total_floor", "&maxfloorn={}"),
        val("house_material_type", "&house_material%5B0%5D={}"),
        F.when(c("metro_id").isNotNull(),
               F.concat(F.lit("&metro%5B0%5D="), c("metro_id"))
               ).otherwise(F.lit("")),
        val("metro_foot_minute", "&only_foot=2&foot_min={}"),
        val("flat_share", "&flat_share={}"),
        flag("only_flat", "&only_flat=1"),
        flag("only_apartment", "&apartment=1"),
        F.when(sort_code.isNotNull(), F.concat(F.lit("&sort="), sort_code)
               ).otherwise(F.lit("")),
    ]
    return F.concat(
        F.lit(BASE_URL), path,
        F.lit("engine_version=2&p="), c("page").cast("string"),
        F.lit("&with_neighbors=0"),
        F.lit("&region="), c("location_id"),
        F.lit("&deal_type="), deal,
        F.lit("&offer_type="), c("accommodation_type"),
        rooms, rent_period, suburban, *settings,
    )
