"""cianparser_spark — a PySpark-native crawl-frontier analytics engine.

Re-creates the query and data-processing semantics of the reference
scraper lenarsaitov/cianparser (see /root/reference) as a distributed,
wave-scheduled URL frontier over snapshot-committed tables of
image + caption payloads.  NOT a port: the reference is a sequential
row-at-a-time HTML walker; this engine expresses the same semantics —
page traversal order, first-wins URL dedup, politeness budgets, field
extraction, per-deal-type schema projection — as DataFrame plans that
Catalyst can optimize, with vectorized pandas/Arrow UDFs for the
branchy text extraction.

Public API mirrors the reference package surface
(reference: cianparser/__init__.py):

    >>> import cianparser_spark as cp
    >>> parser = cp.CianParser(location="Москва")
    >>> rows = parser.get_flats(deal_type="sale", rooms=1)
"""

from cianparser_spark.dims import CITIES, METRO_STATIONS, list_locations, list_metro_stations

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: keep pure-Python subpackages importable without pyspark
    if name == "CianParser":
        from cianparser_spark.engine.facade import CianParser

        return CianParser
    raise AttributeError(name)

__all__ = [
    "CianParser",
    "CITIES",
    "METRO_STATIONS",
    "list_locations",
    "list_metro_stations",
]
