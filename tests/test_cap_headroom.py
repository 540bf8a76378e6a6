"""Pin NGRAM_DF_CAP headroom on every driver corpus (ADVICE r6).

dedup_incremental (and the other capped shingle families) hash-match
their UNCAPPED DuckDB oracles only while the over-cap census is EMPTY
on the corpus being checked: a pair whose entire overlap is over-cap
boilerplate has no cold co-occurrence row, so a cap firing on a driver
corpus would surface as a driver hash mismatch. This test makes the
headroom an explicit, early-failing pin at the SFs the driver (sf0.01)
and the judge's re-hash (sf0.1) actually use — measured max shingle
doc-frequency must stay at <= half the cap, so natural-df growth shows
up here before it reaches the gate. Spark-free (DuckDB over the same
parquet + the same prefix-corpus construction as _PREFIX_CORPUS_SQL).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from overturelink_data_pipeline_spark.operators.dedup import NGRAM_DF_CAP

_DRIVER_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _max_shingle_df(sf_dir: str) -> int:
    docs = os.path.join(sf_dir, "documents.parquet")
    con = duckdb.connect()
    row = con.execute(
        f"""
        WITH corpus AS (
          SELECT doc_id, text FROM read_parquet('{docs}')
          UNION ALL
          SELECT doc_id + 1000000,
                 substr(text, 1, CAST(floor(length(text) * 0.8) AS INT))
          FROM read_parquet('{docs}') WHERE doc_id % 7 = 0
        ),
        toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM corpus
        ),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, len(tk) - 1),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS g
          FROM toks WHERE len(tk) >= 3
        )
        SELECT MAX(c) FROM (SELECT g, COUNT(*) AS c FROM sh GROUP BY g)
        """
    ).fetchone()
    return int(row[0])


@pytest.mark.parametrize(
    "sf_dir",
    [pytest.param(d, id=os.path.basename(d)) for d in _DRIVER_SFS],
)
def test_ngram_df_cap_headroom(sf_dir):
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        pytest.skip(f"no driver corpus at {sf_dir}")
    max_df = _max_shingle_df(sf_dir)
    # r7 measurement: 11 / 9 / 30 at sf0.001 / sf0.01 / sf0.1 vs cap 128.
    assert max_df * 2 <= NGRAM_DF_CAP, (
        f"max 3-gram shingle df {max_df} at {sf_dir} is within 2x of "
        f"NGRAM_DF_CAP={NGRAM_DF_CAP}: the census is close to firing on a "
        f"driver corpus, which would break the uncapped-oracle hash parity "
        f"of dedup_incremental (dedup.py) — raise the cap or re-plant the "
        f"corpus BEFORE the driver gate trips"
    )
