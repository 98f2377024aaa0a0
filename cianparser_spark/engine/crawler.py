"""Wave-scheduled distributed crawl engine.

Executes the reference's sequential crawl semantics
(reference: cianparser/cianparser.py:60-90) as driver-orchestrated
micro-batch waves over snapshot-committed tables:

  frontier scan → politeness budget selection (salted two-phase
  groupBy-host — kills the single-domain skew) → fused fetch+parse
  (mapInPandas, Arrow) → per-seed ordered finalization (watermarks)
  → first-wins dedup (window + Bloom-prefiltered anti-join vs seen)
  → detail enqueue / offer emission → metrics + lineage → one atomic
  commit per wave.

Ordering correctness under parallelism (the hard part): pages of one
seed may be fetched optimistically out of order, but cards only claim
the seen-set once every earlier page of their seed is *resolved*
(parsed, dead-lettered, or cancelled) — the per-seed watermark.  This
reproduces the reference's first-wins-by-crawl-order dedup bit-for-bit
without serializing fetches.

Politeness: the reference sleeps 2 s per list page and 4 s per detail
(reference: flat/list.py:41,64); here a host serves at most
``host_tokens`` per wave, a list fetch costs 1 token and a detail
costs 2, and an HTTP 429 charges a 5-token debt to the host's next
wave (the 10 s penalty, cianparser/cianparser.py:54-55).  Selection is
two-phase so one dominant host cannot skew a single partition: a
salted window pre-selects ≤ budget per (host, salt), then the exact
per-host rank runs over that much smaller survivor set.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cianparser_spark.corpus import webgen
from cianparser_spark.engine import model
from cianparser_spark.engine.bloom import BloomFilter
from cianparser_spark.engine.stage import make_fetch_parse
from cianparser_spark.engine.store import WaveStore
from cianparser_spark.semantics.simulator import CrawlSeed

MAX_ATTEMPTS = 3  # (reference: cianparser/cianparser.py:73)
_BLOOM_BITS = 1 << 20  # per-bucket fixed size so blobs OR-merge


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        run_dir: str,
        seeds: list[CrawlSeed],
        web_cfg: webgen.WebConfig = webgen.DEFAULT_CONFIG,
        host_tokens: int = 64,
        detail_cost: int = 2,
        salt_buckets: int = 4,
        bloom_buckets: int = 16,
    ):
        self.spark = spark
        self.seeds = seeds
        self.web_cfg = web_cfg
        self.host_tokens = host_tokens
        self.detail_cost = detail_cost
        self.salt_buckets = salt_buckets
        self.bloom_buckets = bloom_buckets
        self.runtimes = {s.seed_id: model.seed_runtime(s) for s in seeds}
        self.store = WaveStore(spark, run_dir, model.TABLE_SCHEMAS, model.REPLACE_TABLES)

    # ------------------------------------------------------------ seeding

    def _initial_frontier(self) -> DataFrame:
        """All list-page rows for every seed — the frontier generates
        only pages in [start, end] (limit pushdown at generation,
        reference: cianparser/base_list.py:27-28)."""
        from cianparser_spark.semantics import urls as U

        rows = []
        for s in self.seeds:
            rt = self.runtimes[s.seed_id]
            for p in range(rt["start_page"], rt["end_page"] + 1):
                url = U.format_page_url(rt["template"], p)
                host = url.split("/")[2]
                rows.append((url, "list", host, None, s.seed_id, p, -1, 0, 1))
        return self.spark.createDataFrame(rows, model.FRONTIER_SCHEMA)

    # ---------------------------------------------------------- politeness

    def _select_budget(self, pending: DataFrame, debt: dict[str, int]) -> DataFrame:
        """Two-phase salted per-host token selection; adds bool
        ``_selected``.  Deterministic priority:
        (page_number, detail-before-next-list, seed, card, url)."""
        cost = F.when(F.col("kind") == "detail", F.lit(self.detail_cost)).otherwise(F.lit(1))
        kind_rank = F.when(F.col("kind") == "detail", F.lit(0)).otherwise(F.lit(1))
        df = pending.withColumn("_cost", cost).withColumn("_krank", kind_rank)
        if debt:
            mapping = F.create_map(*[F.lit(x) for kv in debt.items() for x in kv])
            budget = F.lit(self.host_tokens) - F.coalesce(
                mapping[F.col("host")], F.lit(0)
            )
        else:
            budget = F.lit(self.host_tokens)
        df = df.withColumn("_budget", F.greatest(budget, F.lit(0)))

        order = [F.col(c) for c in ("page_number", "_krank", "seed_id", "card_index", "url")]
        df = df.withColumn(
            "_salt", F.pmod(F.xxhash64("url", "seed_id"), F.lit(self.salt_buckets))
        )
        w1 = Window.partitionBy("host", "_salt").orderBy(*order) \
            .rowsBetween(Window.unboundedPreceding, 0)
        df = df.withColumn("_cum1", F.sum("_cost").over(w1))
        survivors = F.col("_cum1") <= F.col("_budget")  # over-select ≤ salt × budget
        w2 = Window.partitionBy("host").orderBy(*order) \
            .rowsBetween(Window.unboundedPreceding, 0)
        df = df.withColumn(
            "_cum2",
            F.when(survivors, F.sum(F.when(survivors, F.col("_cost"))).over(w2)),
        )
        return df.withColumn(
            "_selected", survivors & (F.col("_cum2") <= F.col("_budget"))
        ).drop("_cost", "_krank", "_salt", "_cum1", "_cum2", "_budget")

    # ------------------------------------------------------------- helpers

    def _stopped_map(self) -> dict[int, int]:
        return {
            int(r["seed_id"]): int(r["captcha_page"])
            for r in self.store.read("stopped").collect()
        }

    def _apply_stop_filter(self, df: DataFrame, stopped: dict[int, int], page_col="page_number") -> DataFrame:
        """Drop rows of stopped seeds beyond their captcha page."""
        if not stopped:
            return df
        cond = None
        for sid, p in stopped.items():
            c = (F.col("seed_id") == sid) & (F.col(page_col) >= p)
            cond = c if cond is None else cond | c
        return df.filter(~cond)

    def _debt_from_metrics(self, wave: int) -> dict[str, int]:
        rows = (
            self.store.read("metrics")
            .filter(F.col("wave") == wave)
            .select("host", "n_429")
            .collect()
        )
        return {r["host"]: int(r["n_429"]) * 5 for r in rows if r["n_429"]}

    def _bloom_blobs(self) -> dict[int, BloomFilter]:
        rows = self.store.read("bloom").collect()
        return {int(r["bucket"]): BloomFilter.from_bytes(bytes(r["blob"])) for r in rows}

    # ------------------------------------------------------------ main loop

    def run(self, max_waves: int = 10_000) -> DataFrame:
        if self.store.last_wave() < 0:
            self.store.commit_wave(0, appends={"frontier": self._initial_frontier()})
        wave = self.store.last_wave() + 1
        for _ in range(max_waves):
            if not self._run_wave(wave):
                break
            wave += 1
        return self.offers()

    def offers(self) -> DataFrame:
        return self.store.read("offers").orderBy(*model.ORDER_COLS)

    def _run_wave(self, wave: int) -> bool:
        stopped = self._stopped_map()
        pending = self.store.read("frontier").filter(F.col("wave") == wave)
        pending = self._apply_stop_filter(pending, stopped)
        if pending.limit(1).count() == 0:
            return False

        debt = self._debt_from_metrics(wave - 1)
        marked = self._select_budget(pending, debt).persist()
        selected = marked.filter(F.col("_selected")).drop("_selected")
        deferred = (
            marked.filter(~F.col("_selected"))
            .drop("_selected")
            .withColumn("wave", F.lit(wave + 1).cast("long"))
        )

        par = self.spark.sparkContext.defaultParallelism
        stage = (
            selected.repartition(par, "host", "url")
            .mapInPandas(make_fetch_parse(self.runtimes, self.web_cfg), model.STAGE_SCHEMA)
            .persist()
        )

        pages = stage.filter(F.col("row_type") == "page")
        cards = stage.filter(F.col("row_type") == "card")
        detail_offers = stage.filter(F.col("row_type") == "offer")
        detail_errs = stage.filter(F.col("row_type") == "detail_err")

        # --- captcha circuit breaker (per seed = per reference run)
        new_captcha = pages.filter(F.col("outcome") == "captcha") \
            .groupBy("seed_id").agg(F.min("page_number").alias("p")).collect()
        for r in new_captcha:
            sid, p = int(r["seed_id"]), int(r["p"])
            stopped[sid] = min(stopped.get(sid, 1 << 30), p)
        stopped_df = self.spark.createDataFrame(
            [(k, v) for k, v in stopped.items()], model.STOPPED_SCHEMA
        ) if stopped else self.spark.createDataFrame([], model.STOPPED_SCHEMA)

        # --- retry / dead-letter for failed list fetches
        fails = pages.filter(F.col("outcome").isin("http_error", "http_429", "noheader"))
        retry_list = (
            fails.filter(F.col("attempt") + 1 < MAX_ATTEMPTS)
            .select(
                F.col("fetch_url").alias("url"), F.lit("list").alias("kind"),
                "host", F.lit(None).cast("string").alias("card_json"),
                "seed_id", "page_number",
                F.lit(-1).cast("long").alias("card_index"),
                (F.col("attempt") + 1).alias("attempt"),
                F.lit(wave + 1).cast("long").alias("wave"),
            )
        )
        dead_list = fails.filter(F.col("attempt") + 1 >= MAX_ATTEMPTS).select(
            F.col("fetch_url").alias("url"), F.lit("list").alias("kind"),
            "seed_id", "page_number", (F.col("attempt") + 1).alias("attempt"),
            F.lit(wave).cast("long").alias("wave"),
        )

        # --- detail retries
        retry_detail = (
            detail_errs.filter(F.col("attempt") + 1 < MAX_ATTEMPTS)
            .select(
                F.col("fetch_url").alias("url"), F.lit("detail").alias("kind"),
                "host", "card_json", "seed_id", "page_number", "card_index",
                (F.col("attempt") + 1).alias("attempt"),
                F.lit(wave + 1).cast("long").alias("wave"),
            )
        )
        dead_detail = detail_errs.filter(F.col("attempt") + 1 >= MAX_ATTEMPTS).select(
            F.col("fetch_url").alias("url"), F.lit("detail").alias("kind"),
            "seed_id", "page_number", (F.col("attempt") + 1).alias("attempt"),
            F.lit(wave).cast("long").alias("wave"),
        )

        frontier_next = retry_list.unionByName(
            deferred.select(*[f.name for f in model.FRONTIER_SCHEMA.fields])
        ).unionByName(retry_detail)
        frontier_next = self._apply_stop_filter(frontier_next, stopped).persist()

        # --- staged cards: previous leftovers + this wave's cards
        new_cards = self._apply_stop_filter(
            cards.select(*model.OFFER_COLS, "seed_id", "page_number", "card_index")
            .withColumn("wave", F.lit(wave).cast("long")),
            stopped,
        )
        staged = self.store.read("staged").unionByName(new_cards)
        staged = self._apply_stop_filter(staged, stopped).persist()

        # --- per-seed watermarks: all pages below the smallest pending
        # list page are resolved → their cards may finalize in order
        pending_pages = (
            frontier_next.filter(F.col("kind") == "list")
            .groupBy("seed_id").agg(F.min("page_number").alias("min_pending"))
            .collect()
        )
        min_pending = {int(r["seed_id"]): int(r["min_pending"]) for r in pending_pages}
        wm_rows = [
            (rt["seed_id"], min_pending.get(rt["seed_id"], 1 << 30) - 1)
            for rt in self.runtimes.values()
        ]
        wm_df = self.spark.createDataFrame(wm_rows, "seed_id long, wm long")
        staged = staged.join(F.broadcast(wm_df), "seed_id", "left")
        finalize = staged.filter(F.col("page_number") <= F.col("wm")).drop("wm")
        leftover = staged.filter(F.col("page_number") > F.col("wm")).drop("wm")

        accepted = self._dedup(finalize).persist()

        # --- split: emit now vs enqueue detail fetch
        extra_ids = [sid for sid, rt in self.runtimes.items() if rt["with_extra"]]
        need_detail = accepted.filter(F.col("seed_id").isin(extra_ids)) if extra_ids \
            else accepted.limit(0)
        emit_now = accepted.filter(~F.col("seed_id").isin(extra_ids)) if extra_ids \
            else accepted

        detail_rows = need_detail.select(
            F.col("url"),
            F.lit("detail").alias("kind"),
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.to_json(F.struct(*model.OFFER_COLS)).alias("card_json"),
            "seed_id", "page_number", "card_index",
            F.lit(0).cast("long").alias("attempt"),
            F.lit(wave + 1).cast("long").alias("wave"),
        )
        frontier_next = frontier_next.unionByName(detail_rows)

        seen_new = accepted.select(
            "deal_url_id", "seed_id",
            F.xxhash64(F.concat_ws("|", F.col("seed_id"), F.col("deal_url_id"))).alias("key_hash"),
            F.lit(wave).cast("long").alias("wave"),
        )

        offers_new = emit_now.select(
            *model.OFFER_COLS, "seed_id", "page_number", "card_index"
        ).withColumn("wave", F.lit(wave).cast("long")).unionByName(
            detail_offers.select(
                *model.OFFER_COLS, "seed_id", "page_number", "card_index"
            ).withColumn("wave", F.lit(wave).cast("long"))
        )

        # --- metrics / lineage
        metrics = (
            pages.groupBy("host")
            .agg(
                F.sum(F.when(F.col("outcome") == "ok", 1).otherwise(0)).alias("pages_fetched"),
                F.sum(F.coalesce(F.col("n_cards"), F.lit(0))).alias("cards_parsed"),
                F.sum(F.when(F.col("outcome") == "http_429", 1).otherwise(0)).alias("n_429"),
                F.sum(F.when(F.col("outcome").isin("http_error", "noheader"), 1).otherwise(0)).alias("n_errors"),
                F.max((F.col("outcome") == "captcha").cast("boolean")).alias("captcha"),
            )
            .withColumn("wave", F.lit(wave).cast("long"))
            .withColumn("offers_emitted", F.lit(None).cast("long"))
            .withColumn("details_fetched", F.lit(None).cast("long"))
            .withColumn("avg_price", F.lit(None).cast("double"))
            .select(*[f.name for f in model.METRICS_SCHEMA.fields])
        )
        lineage = (
            stage.groupBy("partition_id")
            .agg(
                F.sum(F.when(F.col("row_type").isin("page", "offer", "detail_err"), 1).otherwise(0)).alias("input_rows"),
                F.sum(F.when(F.col("row_type").isin("card", "offer"), 1).otherwise(0)).alias("output_rows"),
            )
            .withColumn("wave", F.lit(wave).cast("long"))
            .select("wave", "partition_id", "input_rows", "output_rows")
        )

        bloom_df = self._update_bloom(seen_new)

        self.store.commit_wave(
            wave,
            appends={
                "frontier": frontier_next,
                "offers": offers_new,
                "seen": seen_new,
                "dead": dead_list.unionByName(dead_detail),
                "metrics": metrics,
                "lineage": lineage,
            },
            replaces={
                "staged": leftover.select(*[f.name for f in model.STAGED_SCHEMA.fields]),
                "stopped": stopped_df,
                "bloom": bloom_df,
            },
        )
        marked.unpersist()
        stage.unpersist()
        staged.unpersist()
        accepted.unpersist()
        frontier_next.unpersist()
        return True

    # ------------------------------------------------------------- dedup

    def _dedup(self, finalize: DataFrame) -> DataFrame:
        """First-wins dedup in crawl order: window rank inside the
        batch, then Bloom-prefiltered anti-join against the seen set
        (A1/J4 in SURVEY.md §2.6) — maybe-seen rows take the exact
        join; definitely-unseen rows bypass it."""
        w = Window.partitionBy("seed_id", "deal_url_id").orderBy("page_number", "card_index")
        batch_first = (
            finalize.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        blobs = self._bloom_blobs()
        if blobs:
            blob_bytes = {b: f.to_bytes() for b, f in blobs.items()}
            n_buckets = self.bloom_buckets

            @F.pandas_udf("boolean")
            def maybe_seen(keys: pd.Series) -> pd.Series:
                import numpy as np

                from cianparser_spark.engine.bloom import BloomFilter as BF

                local = {b: BF.from_bytes(raw) for b, raw in blob_bytes.items()}
                arr = keys.to_numpy(dtype=object)
                bucket = pd.util.hash_array(arr, hash_key="0123456789abcdef") % np.uint64(n_buckets)
                out = np.zeros(len(arr), dtype=bool)
                for b, f in local.items():
                    mask = bucket == b
                    if mask.any():
                        out[mask] = f.contains(arr[mask])
                return pd.Series(out)

            keyed = batch_first.withColumn(
                "_key", F.concat_ws("|", F.col("seed_id"), F.col("deal_url_id"))
            ).withColumn("_maybe", maybe_seen(F.col("_key")))
            fresh = keyed.filter(~F.col("_maybe")).drop("_key", "_maybe")
            suspect = keyed.filter(F.col("_maybe")).drop("_key", "_maybe")
            checked = suspect.join(
                self.store.read("seen").select("seed_id", "deal_url_id"),
                ["seed_id", "deal_url_id"],
                "left_anti",
            )
            return fresh.unionByName(checked)
        return batch_first.join(
            self.store.read("seen").select("seed_id", "deal_url_id"),
            ["seed_id", "deal_url_id"],
            "left_anti",
        )

    def _update_bloom(self, seen_new: DataFrame) -> DataFrame:
        """Merge this wave's accepted keys into fixed-size per-bucket
        Bloom blobs.  Partial filters are built per bucket with
        applyInPandas (UDAF-shaped), then OR-merged driver-side —
        blobs are small and fixed-size by construction."""
        n_buckets = self.bloom_buckets

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bf = BloomFilter(_BLOOM_BITS)
            keys = (pdf["seed_id"].astype(str) + "|" + pdf["deal_url_id"]).to_numpy(dtype=object)
            if len(keys):
                bf.add(keys)
            return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "blob": [bf.to_bytes()]})

        import numpy as np

        @F.pandas_udf("long")
        def bucket_of(keys: pd.Series) -> pd.Series:
            arr = (keys).to_numpy(dtype=object)
            return pd.Series(
                (pd.util.hash_array(arr, hash_key="0123456789abcdef") % np.uint64(n_buckets)).astype("int64")
            )

        partial = (
            seen_new.withColumn(
                "bucket", bucket_of(F.concat_ws("|", F.col("seed_id"), F.col("deal_url_id")))
            )
            .groupBy("bucket")
            .applyInPandas(build, "bucket long, blob binary")
            .collect()
        )
        merged = self._bloom_blobs()
        for r in partial:
            b = int(r["bucket"])
            incoming = BloomFilter.from_bytes(bytes(r["blob"]))
            if b in merged:
                merged[b].bits |= incoming.bits
            else:
                merged[b] = incoming
        rows = [(b, f.to_bytes()) for b, f in sorted(merged.items())]
        if not rows:
            return self.spark.createDataFrame([], model.BLOOM_SCHEMA)
        return self.spark.createDataFrame(rows, model.BLOOM_SCHEMA)
