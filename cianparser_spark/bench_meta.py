"""Metadata-scan microbench: header-bound vs decode-bound image passes.

The MM6/MM7 scale claim is that PNG-text and EXIF extraction read a
few hundred header bytes per image and never touch the compressed
pixel stream — so a metadata pass over a 100-TB image corpus is
scan-bound, while anything that decodes is CPU-bound by megapixel
inflation.  This microbench quantifies that on the same table:

1. build a PNG corpus WITH textual metadata (tEXt/zTXt/iTXt) as
   parquet, distributed (one encode per executor task);
2. time the metadata-only pass (ops.multimodal.png_text_meta);
3. time the full decode+features pass (ops.multimodal.decode_features)
   over the SAME rows;
4. report images/s for both and the ratio.

The ratio is the honest headline: it is independent of this VM's
minute-to-minute per-core speed (both passes run back-to-back in the
same session), unlike the absolute rows/s.

Run: ``python -m cianparser_spark.bench_meta [n_images]`` or via
bench.py (SPARK_GRAFT_META_IMAGES=0 to skip).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time


def run_bench(spark, n_images: int = 20000, w: int = 64, h: int = 64,
              partitions: int | None = None) -> dict:
    import pandas as pd

    from cianparser_spark.ops.multimodal import decode_features, png_text_meta

    partitions = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_images, 1, partitions)

    def build(iterator):
        from cianparser_spark.corpus import imaging
        from cianparser_spark.ops.multimodal import png_meta_text

        for pdf in iterator:
            out = []
            for i in (int(x) for x in pdf["id"]):
                px = imaging.gen_pixels(i, w, h)
                blob = imaging.png_encode(px, text=png_meta_text(i))
                out.append({"image_id": f"img{i:08d}", "bytes": blob,
                            "fmt": "png"})
            yield pd.DataFrame(out, columns=["image_id", "bytes", "fmt"])

    path = tempfile.mkdtemp(prefix="meta_bench_") + "/images.parquet"
    t0 = time.time()
    ids.mapInPandas(build, "image_id string, bytes binary, fmt string") \
        .write.mode("overwrite").parquet(path)
    build_s = time.time() - t0
    images = spark.read.parquet(path)

    # first touch pays the physical read (and, right after the build,
    # write-back contention on this VM's one virtio disk) — report it
    # separately so the compute-bound numbers aren't polluted by cache
    # state the comparison isn't about
    t0 = time.time()
    n_meta = png_text_meta(images).count()
    meta_cold_s = time.time() - t0
    t0 = time.time()
    png_text_meta(images).count()
    meta_s = time.time() - t0
    t0 = time.time()
    png_text_meta(images, head_bytes=None).count()
    meta_exact_s = time.time() - t0

    t0 = time.time()
    n_dec = decode_features(images).count()
    dec_s = time.time() - t0

    return {
        "n_images": n_images, "wh": f"{w}x{h}",
        "build_s": round(build_s, 2),
        "meta_rows": n_meta,
        "meta_cold_s": round(meta_cold_s, 3),
        "meta_scan_s": round(meta_s, 3),
        "meta_exact_scan_s": round(meta_exact_s, 3),
        "meta_images_per_sec": round(n_images / meta_s),
        "decode_rows": n_dec,
        "decode_s": round(dec_s, 3),
        "decode_images_per_sec": round(n_images / dec_s),
        "meta_over_decode_speedup": round(dec_s / meta_s, 1),
    }


if __name__ == "__main__":
    from cianparser_spark.engine.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    spark = get_spark(app_name="bench_meta", master="local[32]",
                      shuffle_partitions=32)
    print(json.dumps(run_bench(spark, n_images=n)))
