"""dHash image-dedup scale measurement (r13): the registered
q_image_dhash_neardup lane caps at 256 images to keep its arithmetic
oracle cheap; this script runs the SAME operators over the full
documents corpus (one synthetic 16x18 image per doc, same generator)
to measure the banded Hamming join at production scale — hash
computation (row-local mapInPandas through the real PNG codec),
banding explode, candidate self-join, exact verify.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 python scripts/imagehash_scale.py
Output: one JSON line per step on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_study import stage_totals  # noqa: E402
from automated_property_data_ingestion_document_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from automated_property_data_ingestion_document_pipeline_spark import catalog
    from automated_property_data_ingestion_document_pipeline_spark.operators.imagehash import (
        box_downsample_sums,
        dhash63,
        hamming_pairs,
    )
    from automated_property_data_ingestion_document_pipeline_spark.sources.png import (
        decode_png,
        encode_png,
    )

    spark = get_spark(app_name="apdidp-imagehash-scale")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"sf_dir": SF_DIR}), flush=True)

    d = catalog.load(spark, SF_DIR, "documents").select("doc_id")
    n_docs = d.count()

    def _hashes(batches):
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "dhash": []}
            for did in pdf["doc_id"].to_numpy():
                did = int(did)
                scene = did // 4
                y, x = np.ogrid[0:16, 0:18]
                jit = np.where(
                    (did % 4 != 0)
                    & (((did % 4) * 53 + y * 7 + x * 11) % 37 == 0),
                    180,
                    0,
                )
                px = (
                    (13 * y * (1 + scene % 7) + 29 * x * (1 + scene % 11)
                     + 31 * scene + jit) % 251
                ).astype(np.uint8)
                decoded = decode_png(encode_png(px, filter_type=did % 5))[:, :, 0]
                grid = box_downsample_sums(decoded.astype(np.int64), 2, 2)
                out["doc_id"].append(did)
                out["dhash"].append(dhash63(grid))
            yield pd.DataFrame(out)

    hashes = d.mapInPandas(_hashes, "doc_id bigint, dhash bigint")

    pre = stage_totals(spark)
    t0 = time.perf_counter()
    n_hashes = hashes.count()
    hash_sec = round(time.perf_counter() - t0, 3)

    pairs = hamming_pairs(hashes, max_hamming=6)
    t0 = time.perf_counter()
    row = pairs.agg(
        F.count("*").alias("n"), F.max("hamming").alias("max_h")
    ).collect()[0]
    pair_sec = round(time.perf_counter() - t0, 3)
    post = stage_totals(spark)
    mb = lambda a, b: round((b - a) / 1e6, 1)  # noqa: E731
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_hashes": n_hashes,
                "hash_decode_sec": hash_sec,
                "pair_join_sec": pair_sec,
                "shuffle_mb": mb(pre[0], post[0]),
                "mem_spill_mb": mb(pre[1], post[1]),
                "disk_spill_mb": mb(pre[2], post[2]),
                "n_pairs_hamming_le6": row["n"],
                "max_hamming": row["max_h"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
