"""Importable PySpark module for the graft-logstore connector.

The reference ships a 170-line py4j shim (loghub.py:26-196) because its
DStream API is JVM-only. On Spark's DataSource V2 the data path is
language-agnostic — ``spark.read/readStream/write.format("graft-logstore")``
works from Python as-is — so this module is a thin convenience layer:
option spelling for the data path, and py4j calls into
``graft.api.PyBridge`` for the admin surface (store creation, dynamic
config, consumer-group offsets).

Usage::

    from graft_logstore import LogStore

    ls = LogStore(spark, root, "proj", "events")
    ls.create(num_shards=4)
    ls.write_batch(df)                       # __shard__/__time__ route
    df = ls.read_batch(schema="msg INT")     # typed scan
    sdf = ls.read_stream(max_offsets_per_trigger=1000)
    ls.update_config(maxoffsetspertrigger="500")   # live retune (O12)
    ls.commit_offsets("etl", {0: 30})              # consumer group
    ls.read_batch(starting_offsets=ls.resume_offsets_json("etl"))

The JVM side must be on the driver classpath
(``--jars target/scala-2.13/sparkstreaminglogservicespark_2.13-0.1.0.jar``).
"""

FORMAT = "graft-logstore"


# ---- composite operator surface (graft.api.PyOps) -----------------------
#
# The scalar expressions (splitmix64, graft_bloom_might_contain, the
# vector functions) are plain SQL functions once the session extension is
# installed; these four are whole-plan operators, so they cross py4j as
# DataFrame -> DataFrame calls. Each wrapper inherits the Scala plan
# shape unchanged (salted shuffle, hash-threshold sampling, banded
# candidate joins, LSH bucket join).

def _wrap(spark, jdf):
    from pyspark.sql import DataFrame
    return DataFrame(jdf, spark)


def salted_join(big, dim, big_key, dim_key, factor):
    """Skew-resistant inner join: salt the big side, replicate the dim
    side ``factor`` ways; result-identical to ``big.join(dim, key)``."""
    spark = big.sparkSession
    return _wrap(spark, spark._jvm.graft.api.PyOps.saltedInner(
        big._jdf, dim._jdf, big_key, dim_key, int(factor)))


def stratified_sample(df, strata_col, id_col, rates_bp, default_bp):
    """Deterministic RNG-free stratified sample; rates in basis points
    per stratum value, ``default_bp`` for unlisted strata."""
    spark = df.sparkSession
    jmap = spark._jvm.java.util.HashMap()
    for stratum, bp in rates_bp.items():
        jmap.put(str(stratum), int(bp))
    return _wrap(spark, spark._jvm.graft.api.PyOps.stratifiedSample(
        df._jdf, strata_col, id_col, jmap, int(default_bp)))


def edit_distance_pairs(docs, max_dist, text_col="text"):
    """All (a_id, b_id, lev) pairs with Levenshtein <= max_dist over a
    (doc_id, text) frame — complete, via length bands + counting filter
    + banded DP."""
    spark = docs.sparkSession
    return _wrap(spark, spark._jvm.graft.api.PyOps.editDistancePairs(
        docs._jdf, int(max_dist), text_col))


def nn_join(left, right, k, bits):
    """Approximate nearest-neighbor join between two (vec_id, embedding)
    frames: shared LSH hyperplane buckets, exact cosine top-k inside
    each bucket. Returns (query_id, neighbor_id, rank, sim)."""
    spark = left.sparkSession
    return _wrap(spark, spark._jvm.graft.api.PyOps.nnJoin(
        left._jdf, right._jdf, int(k), int(bits)))


def span_removal(docs, span_tokens=8, min_docs=2):
    """ExactSubstr duplicate-span removal over a (doc_id, text) frame:
    tokens covered by any >= min_docs-document span of span_tokens words
    are cut. Returns (doc_id, n_tokens, n_removed, n_kept, clean_fp)."""
    spark = docs.sparkSession
    return _wrap(spark, spark._jvm.graft.api.PyOps.spanRemoval(
        docs._jdf, int(span_tokens), int(min_docs)))


def with_canonical_url(df, url_col, out_col="canonical_url"):
    """Adds ``out_col`` = the crawl-dedup canonical form of ``url_col``:
    fragment dropped, scheme+host lowercased, default port stripped,
    utm_/fbclid/gclid params dropped, surviving params sorted.
    Zero-shuffle (codegen'd string functions)."""
    spark = df.sparkSession
    return _wrap(spark, spark._jvm.graft.api.PyOps.withCanonicalUrl(
        df._jdf, url_col, out_col))


def with_global_rank(df, sort_col, tie_col, rank_col="rank"):
    """Adds ``rank_col`` = the exact 1-based global row number under
    (sort_col asc, tie_col asc) WITHOUT a single-partition sort:
    range-bucketed, per-bucket ranked, prefix-offset joined. ``tie_col``
    must make the order total (e.g. a unique id)."""
    spark = df.sparkSession
    return _wrap(spark, spark._jvm.graft.api.PyOps.withGlobalRank(
        df._jdf, sort_col, tie_col, rank_col))


class LogStore:
    """One store's full API surface from Python."""

    def __init__(self, spark, root, project, store):
        self.spark = spark
        self.root = root
        self.project = project
        self.store = store
        self._bridge = spark._jvm.graft.api.PyBridge

    # ---- option plumbing -------------------------------------------------

    def options(self, **extra):
        """The connector options for this store, plus any extras."""
        opts = {
            "store.root": self.root,
            "store.project": self.project,
            "store.name": self.store,
        }
        opts.update({k.replace("_", ""): str(v) for k, v in extra.items()})
        return opts

    # ---- admin surface (py4j) --------------------------------------------

    def create(self, num_shards):
        self._bridge.createStore(self.root, self.project, self.store,
                                 num_shards)

    def update_config(self, **config):
        """Merge key=value pairs into the store's live config.json (O12);
        a running stream picks them up on its next trigger."""
        jmap = self.spark._jvm.java.util.HashMap()
        for k, v in config.items():
            jmap.put(k, str(v))
        self._bridge.updateSourceConfig(self.root, self.project, self.store,
                                        jmap)

    def read_config(self):
        return dict(self._bridge.readSourceConfig(
            self.root, self.project, self.store))

    def commit_offsets(self, group, offsets):
        """Monotonically merge {shard: ordinal} into the consumer group."""
        jmap = self.spark._jvm.java.util.HashMap()
        for shard, ordinal in offsets.items():
            jmap.put(int(shard), int(ordinal))
        self._bridge.commitOffsets(self.root, self.project, self.store,
                                   group, jmap)

    def committed_offsets(self, group):
        return {int(k): int(v) for k, v in dict(self._bridge.committedOffsets(
            self.root, self.project, self.store, group)).items()}

    def resume_offsets_json(self, group):
        """``startingoffsets`` JSON for the group, or None."""
        return self._bridge.resumeOffsetsJson(self.root, self.project,
                                              self.store, group)

    def compact(self, target_records=1 << 20):
        return self._bridge.compactStore(self.root, self.project, self.store,
                                         target_records)

    def expire(self, before_time):
        return self._bridge.expireStore(self.root, self.project, self.store,
                                        before_time)

    # ---- data path (pure DSv2, no py4j) -----------------------------------

    def read_batch(self, schema=None, starting_offsets=None,
                   ending_offsets=None, start_time=None, end_time=None,
                   slice_shard=1, snapshot_version=None):
        r = (self.spark.read.format(FORMAT).options(**self.options())
             .option("store.sliceshard", str(slice_shard)))
        if snapshot_version is not None:
            r = r.option("store.snapshotversion", str(snapshot_version))
        if schema is not None:
            r = r.schema(schema)
        if starting_offsets is not None:
            r = r.option("startingoffsets", starting_offsets)
        if ending_offsets is not None:
            r = r.option("endingoffsets", ending_offsets)
        if start_time is not None:
            r = r.option("starttime", str(start_time))
        if end_time is not None:
            r = r.option("endtime", str(end_time))
        return r.load()

    def read_stream(self, schema=None, starting_offsets="earliest",
                    max_offsets_per_trigger=65536):
        r = (self.spark.readStream.format(FORMAT).options(**self.options())
             .option("startingoffsets", starting_offsets)
             .option("maxoffsetspertrigger", str(max_offsets_per_trigger)))
        if schema is not None:
            r = r.schema(schema)
        return r.load()

    def write_batch(self, df, routing_column=None):
        w = df.write.format(FORMAT).options(**self.options()).mode("append")
        if routing_column is not None:
            w = w.option("routing.column", routing_column)
        w.save()

    def write_stream(self, df, checkpoint, routing_column=None):
        w = (df.writeStream.format(FORMAT).options(**self.options())
             .option("checkpointLocation", checkpoint))
        if routing_column is not None:
            w = w.option("routing.column", routing_column)
        return w.start()
