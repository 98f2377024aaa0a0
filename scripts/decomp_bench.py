"""Phase decomposition probe: kernel vs widen vs dedup+write at one
parallelism level.  Usage: taskset -c ... python scripts/decomp_bench.py CPUS"""
import dataclasses, os, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cianparser_spark.corpus import webgen
from cianparser_spark.engine import columnar, model
from cianparser_spark.engine.crawler import CrawlEngine
from cianparser_spark.engine.session import get_spark
from cianparser_spark.engine.stage import make_fetch_parse
from cianparser_spark.bench_crawl import build_seeds

cpus = int(sys.argv[1])
seeds_n = int(sys.argv[2]) if len(sys.argv) > 2 else 576
spark = get_spark(app_name="decomp", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
cfg = dataclasses.replace(webgen.DEFAULT_CONFIG,
    universe_base=webgen.SITE_PAGE_CAP * webgen.PAGE_SIZE, universe_span=1,
    fail_500_mod=10**9, fail_429_mod=10**9, faults_on_details=False)
spark.range(0, 1_000_000, 1, cpus).selectExpr("sum(id)").collect()
spark.range(0, cpus * 4, 1, cpus).mapInPandas(lambda it: it, "id long").count()
raw0 = spark.createDataFrame([], model.RAW_STAGE_SCHEMA)
dim0 = columnar.seed_dim(spark, {0: dict(seed_id=0, kind="flat", deal="sale", location="x", suburban_type=None)})
columnar.widen(raw0, dim0).count()

seeds = build_seeds(seeds_n, 54)
run_dir = tempfile.mkdtemp(prefix="decomp_", dir="/dev/shm")
eng = CrawlEngine(spark, run_dir, seeds, cfg, host_tokens=1_000_000)
selected = eng._initial_frontier()
n_selected = selected.count()
dp = spark.sparkContext.defaultParallelism
par = max(1, min(4 * dp, (n_selected + 63) // 64))
raw = (selected.repartition(par, "host", "url")
       .mapInPandas(make_fetch_parse(eng.runtimes, cfg), model.RAW_STAGE_SCHEMA))

t = time.time(); n_raw = raw.count(); t_kernel = time.time() - t
parsed = columnar.widen(raw, eng._seed_dim())
t = time.time()
parsed.agg(F.bit_xor(F.xxhash64(*parsed.columns))).collect()
t_widen = time.time() - t

is_card = F.col("row_type") == "card"
gkey = F.when(is_card, F.concat_ws("|", F.lit("C"), F.col("seed_id"),
              F.coalesce(F.col("deal_url_id"), F.lit("-1")))
      ).otherwise(F.concat_ws("|", F.lit("O"), F.col("row_type"), F.col("seed_id"),
                  F.col("page_number"), F.col("card_index"), F.col("fetch_url")))
payload = F.struct(*[f.name for f in model.STAGE_SCHEMA.fields])
spool = os.path.join(run_dir, "probe-spool")
dd = (parsed.groupBy(gkey.alias("_g"))
 .agg(F.min_by(payload, F.struct("page_number", "card_index")).alias("_f"))
 .select("_f.*"))
t = time.time(); dd.filter(F.col("seed_id") < 0).count(); t_shuffle = time.time() - t
t = time.time()
dd.write.partitionBy("row_type").mode("overwrite").parquet(spool)
t_full = time.time() - t
print({"cpus": cpus, "rows": n_raw, "kernel_s": round(t_kernel, 2),
       "kernel_widen_s": round(t_widen, 2), "shuffle_s": round(t_shuffle, 2),
       "full_s": round(t_full, 2)})
