"""VERDICT r9 ask #6: compact() at realistic append counts — 24
disjoint monthly appends on PostingIndex and BandIndex. Reports, at
checkpoints: sidecar rows, the stored ub (pre-flight bound), whether
the bound still holds for a typical crawl, and warm probe wall; then
compact() and the same after."""
import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from overturelink_data_pipeline_spark.session import get_spark, read_table, ensure_parallelism
from overturelink_data_pipeline_spark.operators.lifecycle import PostingIndex, BandIndex, temp_name, _read_ub
mode, sf = sys.argv[1], sys.argv[2]
cls = {"posting": PostingIndex, "band": BandIndex}[mode]
spark = get_spark(app_name="compact24", cpus="32")
spark.sparkContext.setLogLevel("ERROR")
docs = ensure_parallelism(read_table(spark, sf, "documents")).select("doc_id", "text")
base = docs.filter(F.col("doc_id") % 3 == 0)          # release corpus
probe_crawl = (docs.filter((F.col("doc_id") % 3 == 1) & (F.abs(F.xxhash64("doc_id")) % 7 == 0))
    .select((F.col("doc_id") + 90_000_000).alias("doc_id"),
            F.substring("text", 1, F.floor(F.length("text")*0.8).cast("int")).alias("text")))
idx = cls(spark, temp_name(f"c24_{mode}"))
# the study measures UNCOMPACTED drift across 24 appends, then one
# explicit compact() as the B arm — auto-compact firing mid-study
# would collapse the A arm into the B arm
idx.auto_compact_ub_frac = None
t0=time.time(); idx.build(base); print(f"INFO build {time.time()-t0:.1f}s", flush=True)
sidecar = idx._hcount if mode == "posting" else idx._bcount
def stat(tag):
    rows = spark.table(sidecar).count()
    ub = _read_ub(spark, sidecar)
    idx.probe(probe_crawl).count()
    ts=[]
    for _ in range(3):
        t0=time.time(); idx.probe(probe_crawl).count(); ts.append(time.time()-t0)
    ts.sort()
    open("/tmp/c24_points.jsonl","a").write("POINT " + json.dumps({"tag": tag, "sidecar_rows": rows, "ub": ub, "probe_s": round(ts[1],2)}) + "\n")
stat("build")
for m in range(24):
    crawl = (docs.filter((F.col("doc_id") % 3 == 2) & (F.abs(F.xxhash64("doc_id", F.lit(m))) % 24 == 0))
        .select((F.col("doc_id") + (m+1)*1_000_000_0).alias("doc_id"), "text"))
    idx.append(crawl)
    if m in (5, 11, 23):
        stat(f"after_{m+1}_appends")
t0=time.time(); idx.compact(); print(f"INFO compact {time.time()-t0:.1f}s", flush=True)
stat("after_compact")
idx.drop()
