#!/usr/bin/env python
"""Generate the pinned PQ-centroid fixture (ADVICE r7).

ann_pq_topk's one Lloyd update finishes driver-side with
_round_half_away(sum/n, 6); both the summation order and the rounding
path differ from the oracle's ROUND(AVG(x), 6), and the 1e-6 rounding
absorbing that drift is what the driver hash gate rests on. This
fixture pins the post-update centroid VALUES at the driver SFs so a
near-boundary flip at some future SF is attributable to the update
kernel (fixture diff) rather than surfacing as an opaque hash
mismatch.

Usage: python scripts/gen_pq_centroid_fixture.py
Writes fixtures/pq_centroids/sf{0.001,0.01}.json.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from overturelink_data_pipeline_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        _pq_lloyd_update,
    )
    from overturelink_data_pipeline_spark.session import get_spark, read_table

    spark = get_spark(app_name="gen-pq-centroid-fixture", cpus="8")
    out_dir = os.path.join(REPO, "fixtures", "pq_centroids")
    os.makedirs(out_dir, exist_ok=True)
    for sf in ("0.001", "0.01"):
        sf_dir = f"/root/testdata/sf{sf}"
        raw = read_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        init = sorted(
            raw.filter(F.col("vec_id") < PQ_K).collect(),
            key=lambda r: int(r["vec_id"]),
        )
        cents = [
            {
                int(r["vec_id"]): list(r["v"])[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
                for r in init
            }
            for s in range(PQ_M)
        ]
        updated = _pq_lloyd_update(raw, cents)
        payload = {
            f"{s}:{cl}": vals
            for s, book in enumerate(updated)
            for cl, vals in sorted(book.items())
        }
        path = os.path.join(out_dir, f"sf{sf}.json")
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {path} ({len(payload)} centroids)")
    spark.stop()


if __name__ == "__main__":
    main()
