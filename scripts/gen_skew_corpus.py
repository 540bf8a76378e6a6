"""Build a boilerplate-skewed documents corpus for the dedup skew bench.

Scales sf0.1 documents the same way gen_sf1.py does (id-shifted copies
with per-copy token suffixes), then replaces every ``hot_every``-th doc
with a BOILERPLATE-DOMINATED text: one fixed 60-token paragraph plus a
6-token doc-unique tail, all in one language. That plants exactly the
adversarial structure the near-dup guards exist for:

- ngram: ~58 shingles whose doc-frequency is n/hot_every (thousands) —
  an uncapped inverted index emits df²/2 pairs per hot shingle;
- minhash: most of a hot doc's minhashes come from the boilerplate
  shingle set, so whole bands collapse into single hot buckets;
- simhash: hot docs' signatures agree on most bits, so 16-bit chunks
  collide en masse.

Only documents.parquet is written — the three dedup queries read
nothing else. Usage:

    python scripts/gen_skew_corpus.py [out_dir] [copies] [hot_every]

Defaults: /tmp/testdata/sf1skew, 10 copies (sf1 ≈ 50 k docs), every
20th doc hot (~2 500 hot docs → uncapped ngram candidate volume ≈
58 × 2500²/2 ≈ 1.8e8 pair-rows).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

BOILER = " ".join(
    """this website uses cookies to ensure you get the best experience on
our site by continuing to browse you agree to our terms of service and
privacy policy all rights reserved unauthorized reproduction of this
content is strictly prohibited please contact the site administrator
for permissions subscribe to our newsletter for the latest updates and
exclusive offers delivered straight to your inbox every single week
""".split()[:60]
)
assert len(BOILER.split()) == 60, len(BOILER.split())


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1skew"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    hot_every = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads={os.cpu_count() or 8}")
    k_doc = con.sql(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    sql = f"""
    WITH scaled AS (
      SELECT doc_id + k * {k_doc} AS doc_id,
             CASE WHEN k = 0 THEN text
                  ELSE regexp_replace(text, '(\\S+)', '\\1_' || k, 'g')
             END AS text,
             lang, source
      FROM read_parquet('{SRC}/documents.parquet')
      CROSS JOIN (SELECT unnest(range({copies})) AS k)
    ),
    skewed AS (
      SELECT doc_id,
             CASE WHEN doc_id % {hot_every} = 0
                  THEN '{BOILER}'
                       || ' u' || doc_id || 'a u' || doc_id || 'b u' || doc_id
                       || 'c u' || doc_id || 'd u' || doc_id || 'e u' || doc_id || 'f'
                  ELSE text END AS text,
             CASE WHEN doc_id % {hot_every} = 0 THEN 'en' ELSE lang END AS lang,
             source
      FROM scaled
    )
    SELECT doc_id, text, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM skewed
    """
    dst = f"{out}/documents.parquet"
    con.sql(
        f"COPY ({sql}) TO '{dst}' "
        "(FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 4096)"
    )
    n, hot = con.sql(
        f"SELECT count(*), sum(CASE WHEN doc_id % {hot_every} = 0 THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{dst}')"
    ).fetchone()
    print(f"documents: {n} rows ({hot} hot boilerplate docs) -> {dst}")

    # Companion HOT-ASSET corpus for the mm_dedup_phash skew leg: every
    # hot doc's text is EXACTLY the boilerplate (no unique tail), so the
    # derived media payloads are byte-identical — one ubiquitous asset
    # (default-thumbnail analogue) whose pHash collapses every band
    # bucket it touches. An uncapped band join emits hot²/2 candidate
    # pairs; the capped star path emits hot-1.
    asset_out = out.rstrip("/") + "_asset"
    os.makedirs(asset_out, exist_ok=True)
    asset_dst = f"{asset_out}/documents.parquet"
    con.sql(
        f"""COPY (
        SELECT doc_id,
               CASE WHEN doc_id % {hot_every} = 0 THEN '{BOILER}' ELSE text END AS text,
               lang, source,
               CAST(length(CASE WHEN doc_id % {hot_every} = 0 THEN '{BOILER}'
                           ELSE text END) AS BIGINT) AS n_chars
        FROM read_parquet('{dst}')
        ) TO '{asset_dst}'
        (FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 4096)"""
    )
    print(f"hot-asset corpus ({hot} identical payloads) -> {asset_dst}")


if __name__ == "__main__":
    main()
