#!/usr/bin/env python3
"""PySpark smoke test for the graft-logstore connector (SURVEY §2.1 S10).

The reference ships a py4j shim (loghub.py:26-196) because its DStream
surface is JVM-only; DSv2 makes that shim unnecessary — the same
`spark.read/write.format("graft-logstore")` works from any language
binding. This script proves it end-to-end from Python:

  1. create an embedded store (via the JVM gateway — admin surface),
  2. write the sf0.001 events table through the DSv2 writer,
  3. read it back through the DSv2 scan with a typed schema,
  4. run the c1 aggregate both on the store read and directly on the
     source parquet, and require identical results.

Run:  python3 tools/pyspark_smoke.py
Exit: 0 on match, 1 on mismatch.
"""
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

JAR = "target/scala-2.13/sparkstreaminglogservicespark_2.13-0.1.0.jar"
SF_DIR = "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[4]")
    .appName("graft-pyspark-smoke")
    .config("spark.jars", JAR)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

root = tempfile.mkdtemp(prefix="graft-pyspark-")
# admin surface (store creation) via the gateway; the data path below is
# pure DataFrame API — no shim, the reference's loghub.py equivalent
store = spark._jvm.graft.store.EmbeddedLogStore(root, 10, 1000, 10000)
store.createStore("proj", "events", 4)
opts = {"store.root": root, "store.project": "proj", "store.name": "events"}

events = spark.read.parquet(f"{SF_DIR}/events.parquet")
(
    events.select(
        (F.col("user_id") % 4).cast("int").alias("__shard__"),
        # ts is TIMESTAMP(MICROS)/NTZ since the round-9 testdata regen:
        # epoch seconds via the catalog's NTZ -> TIMESTAMP -> LONG chain
        F.expr("CAST(CAST(ts AS TIMESTAMP) AS LONG)").cast("int").alias("__time__"),
        "event_id", "user_id", "event_type", "value",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts"),
    )
    .write.format("graft-logstore").options(**opts).mode("append").save()
)

def c1_aggregate(df):
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # partitioning differs between the two reads, so a raw double
            # sum differs in the last ulp; round like the catalog's dsum6
            F.round(F.sum(F.col("value")), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("event_type")
    )

back = (
    spark.read.format("graft-logstore").options(**opts)
    .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts LONG")
    .load()
)
got = [tuple(r) for r in c1_aggregate(back).collect()]
want = [tuple(r) for r in c1_aggregate(events).collect()]

print(f"store   : {got}")
print(f"parquet : {want}")
if got != want or len(got) == 0:
    print("MISMATCH between store read-back and source parquet")
    sys.exit(1)
print(f"OK: python DSv2 round-trip matches on {len(got)} groups, "
      f"{back.count()} rows")

# ---------------------------------------------------------------------------
# Importable module (python/graft_logstore.py): the packaged equivalent of
# the reference's loghub.py — data path through the module must match the
# raw DSv2 read above, and the admin surface (dynamic config, consumer
# groups) must round-trip through the py4j bridge.
# ---------------------------------------------------------------------------
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "python"))
from graft_logstore import LogStore

ls = LogStore(spark, root, "proj", "events")
via_module = ls.read_batch(
    schema="event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts LONG")
got_m = [tuple(r) for r in c1_aggregate(via_module).collect()]
if got_m != want:
    print("MISMATCH between module read_batch and source parquet")
    sys.exit(1)

ls.update_config(maxoffsetspertrigger=500, decoy="x")
ls.update_config(decoy="")  # empty string keeps key; deletion is CLI-side
cfg = ls.read_config()
if cfg.get("maxoffsetspertrigger") != "500":
    print(f"MISMATCH in dynamic config round-trip: {cfg}")
    sys.exit(1)

ls.commit_offsets("py-etl", {0: 10, 1: 2})
ls.commit_offsets("py-etl", {0: 7, 1: 5})  # stale shard 0 must not regress
if ls.committed_offsets("py-etl") != {0: 10, 1: 5}:
    print(f"MISMATCH in consumer-group merge: {ls.committed_offsets('py-etl')}")
    sys.exit(1)
resume = ls.resume_offsets_json("py-etl")
if resume is None or "proj#events" not in resume:
    print(f"MISMATCH in resume offsets json: {resume}")
    sys.exit(1)
n_resumed = ls.read_batch(
    schema="event_id LONG", starting_offsets=resume).count()
if n_resumed != back.count() - 15:
    print(f"MISMATCH resuming from group position: {n_resumed}")
    sys.exit(1)
print("OK: graft_logstore module — read_batch parity, dynamic config, "
      "consumer-group commit/resume")

# ---------------------------------------------------------------------------
# mapInPandas multimodal plumbing: binary payload column -> Arrow-batched
# Python decode (the Pandas-UDF shape of Multimodal.extractFeatures). The
# payloads are REAL 24bpp BMPs built here byte-for-byte like the Scala
# encoder (Multimodal.encodeBmp24), so the Python batch decode proves the
# cross-language contract on the same wire format.
# ---------------------------------------------------------------------------
import struct


def encode_bmp24(w, h, luma):
    row = (w * 3 + 3) & ~3
    size = 54 + row * h
    head = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, row * h, 2835, 2835, 0, 0)
    body = bytearray()
    for y in range(h):
        for x in range(w):
            v = luma[y * w + x]
            body += bytes((v, v, v))
        body += b"\x00" * (row - w * 3)
    return head + info + bytes(body)


W, H = 16, 8
assets = spark.createDataFrame(
    [(i, bytearray(encode_bmp24(W, H, [(i * 31 + p) % 256 for p in range(W * H)])))
     for i in range(100)],
    "asset_id LONG, payload BINARY",
)


def decode_batch(batches):
    # per-batch codec init happens once per Arrow batch, not per row
    for pdf in batches:
        rows = []
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            b = bytes(payload)
            (w, hh) = struct.unpack_from("<ii", b, 18)
            hh = abs(hh)
            row = (w * 3 + 3) & ~3
            total = sum(b[54 + y * row + x * 3] for y in range(hh) for x in range(w))
            rows.append((aid, w, hh, total / (w * hh)))
        import pandas as pd
        yield pd.DataFrame(rows, columns=["asset_id", "width", "height", "mean_luma"])


feats = assets.mapInPandas(
    decode_batch, "asset_id LONG, width INT, height INT, mean_luma DOUBLE"
)
got2 = {r["asset_id"]: (r["width"], r["height"], round(r["mean_luma"], 9))
        for r in feats.collect()}
want2 = {i: (W, H, round(sum((i * 31 + p) % 256 for p in range(W * H)) / (W * H), 9))
         for i in range(100)}
if got2 != want2:
    print("MISMATCH in mapInPandas BMP batch decode")
    sys.exit(1)
print(f"OK: mapInPandas decoded {len(got2)} BMP payloads to exact dims + mean luma")

# ---------------------------------------------------------------------------
# SQL function surface from Python: every engine-registered function is a
# plain spark.sql call away — no py4j wrapper per function. Pin a few with
# known values (splitmix64 reference from CmsOps.mix's published constants;
# dot_product/cosine on a hand vector; an HLL build/estimate on integers).
# ---------------------------------------------------------------------------
spark._jvm.graft.functions.GraftFunctions.registerAll(spark._jsparkSession)
row = spark.sql(
    "SELECT splitmix64(0), splitmix64(40, 2), "
    "dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)), "
    "cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))"
).head()
# pin the SQL results against the JVM kernel through the same gateway
jvm_mix0 = spark._jvm.graft.functions.SplitMix64Expr.mix(0)
jvm_mix42 = spark._jvm.graft.functions.SplitMix64Expr.mix(42)
if row[0] != jvm_mix0 or row[1] != jvm_mix42:
    print(f"MISMATCH splitmix64 from SQL: {row[0]}, {row[1]}")
    sys.exit(1)
if row[2] != 32.0 or row[3] != 1.0:
    print(f"MISMATCH dot_product/cosine_sim from SQL: {row[2]}, {row[3]}")
    sys.exit(1)
est = spark.sql(
    "SELECT hll_estimate(hll_build(id)) FROM range(0, 1000)").head()[0]
if not (900 <= est <= 1100):
    print(f"MISMATCH hll estimate from SQL: {est}")
    sys.exit(1)
print("OK: SQL function surface (splitmix64/dot_product/cosine_sim/hll) "
      "from Python")

# ---------------------------------------------------------------------------
# Composite operator surface (graft.api.PyOps via graft_logstore wrappers):
# the whole-plan operators — salted skew join, deterministic stratified
# sampling, complete thresholded-Levenshtein pair mining, LSH nn-join —
# callable from Python with the Scala plan shapes unchanged.
# ---------------------------------------------------------------------------
from graft_logstore import (salted_join, stratified_sample,
                            edit_distance_pairs, nn_join, span_removal,
                            with_canonical_url, with_global_rank)

# salted_join: provably result-identical to the plain inner join
dim = spark.createDataFrame(
    [("click", 1), ("view", 2), ("purchase", 3), ("scroll", 4)],
    "etype STRING, weight INT")
plain = (events.join(dim, events.event_type == dim.etype)
         .agg(F.count(F.lit(1)), F.sum("weight")).head())
salted = (salted_join(events, dim, "event_type", "etype", 8)
          .agg(F.count(F.lit(1)), F.sum("weight")).head())
if tuple(plain) != tuple(salted) or plain[0] == 0:
    print(f"MISMATCH salted_join vs plain join: {tuple(salted)} != {tuple(plain)}")
    sys.exit(1)

# stratified_sample: deterministic (identical resample), honors 0 bp
samp1 = stratified_sample(events, "event_type", "event_id",
                          {"click": 5000, "view": 0}, 2500)
samp2 = stratified_sample(events, "event_type", "event_id",
                          {"click": 5000, "view": 0}, 2500)
ids1 = sorted(r[0] for r in samp1.select("event_id").collect())
ids2 = sorted(r[0] for r in samp2.select("event_id").collect())
n_view = samp1.filter(F.col("event_type") == "view").count()
if ids1 != ids2 or len(ids1) == 0 or n_view != 0:
    print(f"MISMATCH stratified_sample: n={len(ids1)} vs {len(ids2)}, "
          f"view rows={n_view}")
    sys.exit(1)

# edit_distance_pairs: complete answer on a hand corpus
docs = spark.createDataFrame(
    [(1, "abcdef"), (2, "abcdefg"), (3, "xyz"), (4, "abcxef")],
    "doc_id LONG, text STRING")
pairs = {(r["a_id"], r["b_id"]): r["lev"]
         for r in edit_distance_pairs(docs, 2).collect()}
if pairs != {(1, 2): 1, (1, 4): 1, (2, 4): 2}:
    print(f"MISMATCH edit_distance_pairs: {pairs}")
    sys.exit(1)

# nn_join: identical corpora -> every vector's top-1 is itself at sim 1
vecs = spark.createDataFrame(
    [(i, [float(i == j) + 0.01 * j for j in range(8)]) for i in range(8)],
    "vec_id LONG, embedding ARRAY<DOUBLE>")
top1 = nn_join(vecs, vecs, 1, 4).collect()
self_hits = {r["query_id"]: r["neighbor_id"] for r in top1}
if len(top1) != 8 or any(q != n for q, n in self_hits.items()):
    print(f"MISMATCH nn_join self top-1: {self_hits}")
    sys.exit(1)
# span_removal: a 10-token span shared by docs 1 and 2 is cut from both;
# doc 3 shares nothing and keeps every token
base = "one two three four five six seven eight nine ten"
sdocs = spark.createDataFrame(
    [(1, base + " tail1 only"), (2, "head2 " + base), (3, "alpha beta gamma")],
    "doc_id LONG, text STRING")
sr = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["n_kept"])
      for r in span_removal(sdocs, 8, 2).collect()}
if sr != {1: (12, 10, 2), 2: (11, 10, 1), 3: (3, 0, 3)}:
    print(f"MISMATCH span_removal: {sr}")
    sys.exit(1)

# with_canonical_url: aliases collapse onto one canonical form
urls = spark.createDataFrame(
    [(1, "HTTPS://E.COM:443/p?utm_source=x&b=2&a=1#f"),
     (2, "https://e.com/p?a=1&b=2")],
    "doc_id LONG, url STRING")
canon = {r["doc_id"]: r["canonical_url"]
         for r in with_canonical_url(urls, "url").collect()}
if canon != {1: "https://e.com/p?a=1&b=2", 2: "https://e.com/p?a=1&b=2"}:
    print(f"MISMATCH with_canonical_url: {canon}")
    sys.exit(1)

# with_global_rank: exact 1..N permutation matching the sorted order
rk = with_global_rank(events.select("event_id", "user_id"),
                      "user_id", "event_id").collect()
want = sorted(rk, key=lambda r: (r["user_id"], r["event_id"]))
got_ranks = sorted(r["rank"] for r in rk)
by_rank = {r["rank"]: r["event_id"] for r in rk}
if (got_ranks != list(range(1, len(rk) + 1)) or
        any(by_rank[i + 1] != w["event_id"] for i, w in enumerate(want))):
    print("MISMATCH with_global_rank ordering")
    sys.exit(1)

print("OK: composite operator surface (salted_join/stratified_sample/"
      "edit_distance_pairs/nn_join/span_removal/with_canonical_url/"
      "with_global_rank) from Python")
sys.exit(0)
