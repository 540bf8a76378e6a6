"""A/B for VERDICT r9 ask #5: push the crawl's (band,bucket) footprint
as a scan predicate (per-band bucket BETWEEN ranges — the only
planning-cheap parquet-pushable shape) over the sortBy(band,bucket)
band table, vs the shipped unpredicated scan."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from overturelink_data_pipeline_spark.session import get_spark, read_table, ensure_parallelism
from overturelink_data_pipeline_spark.operators.lifecycle import BandIndex, temp_name, _postings
from overturelink_data_pipeline_spark.operators.dedup import minhash_signatures_agg, _band_table, _fresh_persist, _jaccard_verify
sf = sys.argv[1]
spark = get_spark(app_name="ab-band-prune", cpus="32")
spark.sparkContext.setLogLevel("ERROR")
docs = ensure_parallelism(read_table(spark, sf, "documents")).select("doc_id", "text")
n = docs.count()
frac = min(1.0, 5000 / max(n, 1))
crawl = (docs.filter(F.abs(F.xxhash64("doc_id")) % 10000 < int(frac * 10000))
    .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.substring("text", 1, F.floor(F.length("text") * 0.8).cast("int")).alias("text")))
idx = BandIndex(spark, temp_name("abp"))
t0=time.time(); idx.build(docs); print(f"build {time.time()-t0:.1f}s corpus {n}", flush=True)
# shipped probe
idx.probe(crawl).count()
ship=[]
for _ in range(3):
    t0=time.time(); m=idx.probe(crawl).count(); ship.append(time.time()-t0)
ship.sort()
# variant: per-band bucket min/max predicate on the table scan
delta_bands = _fresh_persist("abp_delta", _band_table(minhash_signatures_agg(_postings(crawl))))
rng = (delta_bands.groupBy("band").agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))).collect()
pred = None
for r in rng:
    c = (F.col("band")==r["band"]) & F.col("bucket").between(r["lo"], r["hi"])
    pred = c if pred is None else (pred | c)
tbl = spark.table(idx._bands)
total = tbl.count(); kept = tbl.filter(pred).count()
print(f"selectivity: kept {kept}/{total} = {kept/total:.4f}", flush=True)
# time the pruned scan feeding the same candidate join shape
def cand_count(index_side):
    d, o = delta_bands.alias("d"), index_side.alias("o")
    j = d.join(o, (F.col("d.band")==F.col("o.band")) & (F.col("d.bucket")==F.col("o.bucket")) & (F.col("d.doc_id")!=F.col("o.doc_id")))
    return j.count()
cand_count(tbl)  # warm
a=[]; b=[]
for _ in range(3):
    t0=time.time(); cand_count(tbl); a.append(time.time()-t0)
    t0=time.time(); cand_count(tbl.filter(pred)); b.append(time.time()-t0)
a.sort(); b.sort()
print(f"RESULT sf={sf} probe_shipped={ship[1]:.2f}s cand_unpred={a[1]:.2f}s cand_pred={b[1]:.2f}s selectivity={kept/total:.4f}", flush=True)
idx.drop()
