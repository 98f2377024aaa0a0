"""Reference-compatible API facade over the distributed engine.

Drop-in surface for the reference's public API
(reference: cianparser/cianparser.py:20-175): same constructor, same
method names/signatures/validation, same return shape (list of dicts
in crawl order with the reference's sentinel and projection
conventions), same ``;``-CSV side effect.  Underneath, each call plans
a seed, runs the wave engine, and collects through the compat sink.

Deliberate deviations (SURVEY.md quirks appendix):
* unknown location raises ValueError (the reference builds the error
  and forgets to raise it, cianparser/cianparser.py:184-186);
* the CSV is written once at the end, not rewritten per offer
  (reference: cianparser/base_list.py:88-95 is O(n²) I/O);
* projection is applied to returned rows consistently (the reference
  only projects when with_saving_csv=True, as save_results mutates
  result rows in place).
"""

from __future__ import annotations

import pathlib
import tempfile

from pyspark.sql import SparkSession

from cianparser_spark.corpus import webgen
from cianparser_spark.dims import location_id
from cianparser_spark.engine import compat
from cianparser_spark.engine.crawler import CrawlEngine
from cianparser_spark.semantics import urls
from cianparser_spark.semantics.simulator import CrawlSeed


def _translit(s: str) -> str:
    """ASCII filename slug (the reference uses the transliterate
    package, cianparser/flat/list.py:16; we stay dependency-free)."""
    table = {
        "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
        "ё": "e", "ж": "zh", "з": "z", "и": "i", "й": "j", "к": "k",
        "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
        "с": "s", "т": "t", "у": "u", "ф": "f", "х": "h", "ц": "c",
        "ч": "ch", "ш": "sh", "щ": "sch", "ъ": "", "ы": "y", "ь": "",
        "э": "e", "ю": "yu", "я": "ya", " ": "_", "-": "-",
    }
    return "".join(table.get(ch, ch) for ch in s.lower())


class CianParser:
    """PySpark-native re-creation of the reference's entry class."""

    def __init__(
        self,
        location: str,
        proxies=None,
        spark: SparkSession | None = None,
        web_cfg: webgen.WebConfig = webgen.DEFAULT_CONFIG,
        run_dir: str | None = None,
        host_tokens: int = 256,
        output_dir: str | None = None,
        respect_robots: bool = True,
    ):
        self.__location_id__ = location_id(location)  # raises on unknown
        self.__location_name__ = location
        # proxies fold into the web config: the engine's fetch kernels
        # resolve an executor-local ProxyPool from it (S4; reference:
        # cianparser.py:35,39-48 + proxy_pool.py:9-61)
        if proxies:
            import dataclasses

            web_cfg = dataclasses.replace(web_cfg, proxies=tuple(proxies))
        self._proxies = proxies
        self._web_cfg = web_cfg
        self._host_tokens = host_tokens
        self._respect_robots = respect_robots
        self._run_dir = run_dir
        self._output_dir = output_dir or str(pathlib.Path.cwd())
        if spark is None:
            from cianparser_spark.engine.session import get_spark

            spark = get_spark(app_name=f"cianparser_{location}")
        self._spark = spark
        self._next_seed_id = 1
        self.result: list[dict] = []

    # -------------------------------------------------------------- public

    def get_flats(self, deal_type: str, rooms, with_saving_csv: bool = False,
                  with_extra_data: bool = False, additional_settings: dict | None = None) -> list[dict]:
        """(reference: cianparser/cianparser.py:92-123)"""
        urls.validate_flats_args(deal_type, rooms)
        seed = self._seed("flat", deal_type, rooms=rooms,
                          with_extra_data=with_extra_data,
                          additional_settings=additional_settings)
        return self._run(seed, with_saving_csv, file_kind="flat")

    def get_suburban(self, suburban_type: str, deal_type: str,
                     with_saving_csv: bool = False, with_extra_data: bool = False,
                     additional_settings: dict | None = None) -> list[dict]:
        """(reference: cianparser/cianparser.py:125-157)"""
        urls.validate_suburban_args(suburban_type, deal_type)
        seed = self._seed("suburban", deal_type, suburban_type=suburban_type,
                          with_extra_data=with_extra_data,
                          additional_settings=additional_settings)
        return self._run(seed, with_saving_csv, file_kind="suburban")

    def get_newobjects(self, with_saving_csv: bool = False) -> list[dict]:
        """(reference: cianparser/cianparser.py:159-175)"""
        seed = self._seed("newobject", "sale")
        return self._run(seed, with_saving_csv, file_kind="newobject")

    # ------------------------------------------------------------ plumbing

    def _seed(self, kind: str, deal_type: str, rooms=None, suburban_type=None,
              with_extra_data=False, additional_settings=None) -> CrawlSeed:
        seed = CrawlSeed(
            seed_id=self._next_seed_id,
            location=self.__location_name__,
            accommodation_type=kind,
            deal_type=deal_type,
            rooms=rooms,
            suburban_type=suburban_type,
            with_extra_data=with_extra_data,
            additional_settings=additional_settings,
        )
        self._next_seed_id += 1
        return seed

    def _run(self, seed: CrawlSeed, with_saving_csv: bool, file_kind: str) -> list[dict]:
        run_dir = self._run_dir or tempfile.mkdtemp(prefix="cianspark_run_")
        engine = CrawlEngine(self._spark, run_dir, [seed], self._web_cfg,
                             host_tokens=self._host_tokens,
                             respect_robots=self._respect_robots)
        offers = engine.run()
        self.result = compat.to_reference_rows(offers, [seed])
        if with_saving_csv and self.result:
            compat.write_reference_csv(self.result, self._file_path(seed, file_kind))
        return self.result

    def _file_path(self, seed: CrawlSeed, file_kind: str) -> str:
        """Reference filename format with the wave number standing in
        for the timestamp (determinism; reference: flat/list.py:14-17,
        suburban/list.py:14-17, newobject/list.py:31-34)."""
        loc = _translit(self.__location_name__).replace("'", "")
        start, end = seed.pages()
        deal, _ = urls.rewrite_deal_type(seed.deal_type)
        if file_kind == "newobject":
            name = f"cian_newobject_{loc}_run{seed.seed_id}.csv"
        elif file_kind == "suburban":
            name = f"cian_suburban_{deal}_{seed.suburban_type}_{start}_{end}_{loc}_run{seed.seed_id}.csv"
        else:
            name = f"cian_flat_{deal}_{start}_{end}_{loc}_run{seed.seed_id}.csv"
        return str(pathlib.Path(self._output_dir, name))
