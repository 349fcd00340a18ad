"""Streaming maintenance of the MinHash-LSH dup-cluster table —
incremental connected components, exactly-once by idempotence.

The batch side (``operators.dedup.dup_clusters``) runs connected
components over the band-collision graph of the WHOLE corpus: every doc
in any candidate pair gets ``cluster_id`` = the smallest doc_id reachable
through shared (band, band_hash) buckets. Under a live document ingest
that recompute is O(corpus) per batch; this twin maintains the SAME
clustering incrementally, per-batch cost O(batch + touched clusters):

- two docs are near-dup candidates iff they share an LSH bucket, so the
  collision graph is bipartite doc–bucket and the index only ever needs
  one label per doc and one label per bucket;
- labels are IMMUTABLE once written (append-only ``docs/v=<b>`` and
  ``buckets/v=<b>`` delta dirs). When a bridge document arriving in batch
  b connects two previously-separate clusters, nothing is rewritten:
  the apply step records a MERGE EDGE (``merges/v=<b>``) and readers
  resolve final labels through the merge graph (tiny — one edge per
  cluster merge ever, resolved with the same ``connected_components``
  used for the batch operator; stored labels that were never merged are
  fixed points). This is what makes a cluster merge RETRACTION-FREE:
  the earlier cluster's rows stay bit-identical, only the read-time
  resolution changes — the growth report's overlay argument applied to
  graph labels;
- each micro-batch classifies ONLY its own docs: band-hash the batch
  (one shuffle), equi-join its buckets against the maintained bucket
  index (never doc×doc), run connected components on the CONTRACTED
  graph — batch docs + the touched existing cluster labels, a graph
  bounded by the batch size, not the corpus;
- exactly-once by idempotence: per-batch ``v=<batch_id>`` overwrites,
  write order buckets → merges → docs, so the committed ``docs/v=b``
  dir is the batch's commit marker — readers and later applies consume
  a version's buckets/merges only when its docs dir landed, and a crash
  in any window reads as if the batch never ran until its replay
  (the protocol of streaming/growth.py, streaming/ann_index.py and
  streaming/cdc.py; ``_dedup_meta.json`` pins the batch-id epoch);
- **compaction** (``dedup_compact``) folds acknowledged deltas into
  ``docs_base/v=<C>`` / ``buckets_base/v=<C>`` generations WITH the
  merge map applied (path compression: folded labels become fixed
  points) and deletes the applied merge edges; read-side listing is
  O(1 + batches-since-compact). Per-table base floors keep every crash
  window safe: an un-pruned merge edge re-applied to an already-resolved
  label is a no-op (resolved labels are fixed points of the merge map),
  and a torn base (no ``_SUCCESS``) is invisible.

At 100 TB: the bucket index is the persisted artifact (exactly the
asymmetry ``dedup.incremental_near_dup`` exploits), per-batch work is
O(batch) plus one equi-join against it, the merge graph stays tiny
(bounded by cluster merges, not docs), and compaction is the amortized
OPTIMIZE step. Drained over a stream, ``read_dup_clusters`` equals the
batch ``dup_clusters`` EXACTLY — including cross-batch cluster merges —
pinned in tests/test_streaming_dedup_index.py.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import dedup

_META = "_dedup_meta.json"

_DOCS_SCHEMA = "doc_id long, label long"
_BUCKETS_SCHEMA = "band int, band_hash string, label long"
_MERGES_SCHEMA = "label_a long, label_b long"


def _read_meta(path: str) -> dict:
    p = os.path.join(path, _META)
    if os.path.isfile(p):
        with open(p) as f:
            return json.load(f)
    return {"high_water": -1, "compacted_through": -1}


def _write_meta(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _META))  # atomic on POSIX


def _committed(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "_SUCCESS"))


def _versions(path: str, sub: str) -> list[int]:
    d = os.path.join(path, sub)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(d)
        if name.startswith("v=") and _committed(os.path.join(d, name))
    )


def _visible_versions(table_path: str, below: int | None = None) -> list[int]:
    """Batch versions whose COMMIT MARKER (the docs dir, written last)
    landed — a version's buckets/merges dirs are consumed only through
    this list, so a crash between the buckets/merges writes and the docs
    write leaves the whole batch invisible (the growth module's
    state-ceiling rule, keyed per version)."""
    return [
        v
        for v in _versions(table_path, "docs")
        if below is None or v < below
    ]


def _base_version(table_path: str, sub: str) -> int:
    vs = _versions(table_path, f"{sub}_base")
    return vs[-1] if vs else -1


def _read_table(
    spark, table_path: str, sub: str, schema: str, below: int | None = None
) -> DataFrame:
    """Newest committed ``<sub>_base`` generation plus every visible delta
    newer than it (append-only tables — resolution is a pure union; the
    base-derived floor keeps a compaction crash from double-reading
    folded deltas)."""
    floor = _base_version(table_path, sub)
    parts = [f"{table_path}/{sub}_base/v={floor}"] if floor >= 0 else []
    parts += [
        f"{table_path}/{sub}/v={v}"
        for v in _visible_versions(table_path, below)
        if v > floor and _committed(os.path.join(table_path, sub, f"v={v}"))
    ]
    if not parts:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*parts)


def _merge_map(spark, table_path: str, below: int | None = None) -> DataFrame:
    """(label, final) for every label touched by a merge edge — connected
    components over the (tiny) merge graph; labels never merged are fixed
    points and simply absent. Applied merge edges are deleted by
    compaction; re-applying a not-yet-pruned edge to an already-resolved
    label is a no-op because component minima map to themselves."""
    edges = _read_table(spark, table_path, "merges", _MERGES_SCHEMA, below)
    comps = dedup.connected_components(
        edges.select(
            F.col("label_a").alias("doc_a"), F.col("label_b").alias("doc_b")
        )
    )
    return comps.select(F.col("doc_id").alias("label"), F.col("cluster_id").alias("final"))


def _resolve(labeled: DataFrame, merge_map: DataFrame) -> DataFrame:
    """Apply the merge map to a (…, label) relation → (…, final label).
    The map is bounded by cluster merges ever performed, so the join is a
    broadcast against the big labeled side."""
    return labeled.join(F.broadcast(merge_map), "label", "left_outer").withColumn(
        "label", F.coalesce("final", "label")
    ).drop("final")


def dedup_apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    n: int = 3,
    bands: int = dedup.LSH_BANDS,
    rows: int = dedup.LSH_ROWS,
) -> bool:
    """One idempotent apply step (the foreachBatch body, callable directly
    for replay tests). Band-hashes the batch's NEW docs, joins their
    buckets against the maintained index, labels them with connected
    components over the contracted graph, and records any cluster merges
    as edges. Returns True when the batch changed the table.

    Re-arrivals of already-indexed doc_ids are ignored (at-least-once
    sources re-deliver; content is keyed by doc_id). Docs with no
    shingles (< n tokens) are indexed as singletons and never collide —
    exactly the batch operator's behavior."""
    meta = _read_meta(table_path)
    if batch_id == meta["high_water"]:
        return False  # completed batch replay: dirs already committed
    if batch_id < meta["high_water"]:
        raise ValueError(
            f"batch_id {batch_id} below table high water {meta['high_water']}: "
            f"the checkpoint driving {table_path!r} was reset or swapped; "
            "table and checkpoint must live and die together"
        )
    if not batch_df.head(1):
        return False
    spark = batch_df.sparkSession

    seen = _read_table(spark, table_path, "docs", _DOCS_SCHEMA, below=batch_id)
    new_docs = (
        batch_df.select("doc_id", "text")
        .dropDuplicates(["doc_id"])
        .join(seen.select("doc_id"), "doc_id", "left_anti")
    )
    if not new_docs.head(1):
        return False

    # one shuffle: shingle + all bands×rows mins in a single groupBy
    bands_new = dedup.minhash_band_table(
        dedup.shingle_table(new_docs, n), bands, rows
    ).persist()

    prior = _read_table(
        spark, table_path, "buckets", _BUCKETS_SCHEMA, below=batch_id
    )
    mm = _merge_map(spark, table_path, below=batch_id)
    hits = _resolve(
        bands_new.join(prior, ["band", "band_hash"]).select(
            "doc_id", F.col("label")
        ),
        mm,
    ).distinct()

    # contracted graph: batch docs sharing a bucket (star to the bucket's
    # min doc — same components, fewer edges) + doc→touched-cluster edges.
    # Node ids share one space: cluster labels ARE doc ids.
    w_min = F.min("doc_id").over(Window.partitionBy("band", "band_hash"))
    intra = (
        bands_new.select("doc_id", "band", "band_hash")
        .withColumn("rep", w_min)
        .filter(F.col("rep") != F.col("doc_id"))
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    touch = hits.select(
        F.col("doc_id").alias("doc_a"), F.col("label").alias("doc_b")
    )
    comps = dedup.connected_components(intra.unionByName(touch).distinct())

    labels = (
        bands_new.select("doc_id")
        .distinct()
        .unionByName(new_docs.select("doc_id"))
        .distinct()
        .join(comps, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("label"),
        )
        .persist()
    )

    # cluster merges: a touched existing label whose component resolved
    # below it — recorded as an edge, never rewritten in place
    new_merges = (
        comps.join(
            hits.select(F.col("label").alias("doc_id")).distinct(), "doc_id"
        )
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select(
            F.col("cluster_id").alias("label_a"), F.col("doc_id").alias("label_b")
        )
        .distinct()
    )

    # buckets first seen in this batch, labeled by their (any) member's
    # final label — members sharing a bucket share a component
    new_buckets = (
        bands_new.join(prior.select("band", "band_hash"), ["band", "band_hash"], "left_anti")
        .groupBy("band", "band_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(labels, "doc_id")
        .select("band", "band_hash", "label")
    )

    # write order: buckets → merges → docs (docs = the commit marker);
    # meta last. Any crash window leaves the batch invisible and the
    # replay overwrites all dirs deterministically from the same prior
    # state (reads above are capped below batch_id).
    #
    # replay guard: if the FIRST attempt crashed after committing
    # docs/v=b but before meta, that stale commit marker would keep the
    # batch's docs visible while this replay overwrites merges/v=b —
    # a concurrent reader in that window would resolve batch-b docs
    # against torn merge edges (pre-merge cluster ids). Un-commit the
    # stale docs dir up front so the whole batch stays invisible until
    # the replay's own docs write re-commits it.
    stale_marker = os.path.join(table_path, "docs", f"v={batch_id}", "_SUCCESS")
    if os.path.isfile(stale_marker):
        os.remove(stale_marker)
    new_buckets.write.mode("overwrite").parquet(
        f"{table_path}/buckets/v={batch_id}"
    )
    new_merges.write.mode("overwrite").parquet(
        f"{table_path}/merges/v={batch_id}"
    )
    new_docs.select("doc_id").join(labels, "doc_id").select(
        "doc_id", "label"
    ).write.mode("overwrite").parquet(f"{table_path}/docs/v={batch_id}")
    bands_new.unpersist()
    labels.unpersist()
    meta["high_water"] = max(meta["high_water"], batch_id)
    _write_meta(table_path, meta)
    return True


def read_dup_clusters(spark, table_path: str) -> DataFrame:
    """The maintained dup-cluster table: (doc_id, cluster_id) for every
    doc in a cluster of ≥2 — docs sharing no bucket with anyone are not
    in any candidate pair, exactly the batch operator's node set. Drained
    over a stream this equals ``dedup.dup_clusters`` over the same
    documents, including clusters merged across micro-batches."""
    docs = _read_table(spark, table_path, "docs", _DOCS_SCHEMA)
    resolved = _resolve(docs, _merge_map(spark, table_path)).select(
        "doc_id", F.col("label").alias("cluster_id")
    )
    sizes = resolved.groupBy("cluster_id").agg(F.count("*").alias("__n"))
    return (
        resolved.join(sizes.filter(F.col("__n") >= 2), "cluster_id")
        .select("doc_id", "cluster_id")
    )


def read_canonical_ids(spark, table_path: str) -> DataFrame:
    """doc_ids the maintained clustering KEEPS — every cluster's minimum
    plus all singletons (``dedup.keep_canonical``'s id set)."""
    docs = _read_table(spark, table_path, "docs", _DOCS_SCHEMA)
    resolved = _resolve(docs, _merge_map(spark, table_path))
    return resolved.filter(F.col("doc_id") == F.col("label")).select("doc_id")


def dedup_compact(spark, table_path: str) -> None:
    """Fold acknowledged deltas into per-table base generations with the
    merge map APPLIED (path compression — folded labels become fixed
    points of every retained merge edge), then prune folded dirs.

    Crash ordering: (1) docs_base, (2) buckets_base, (3) meta, (4) prune
    folded deltas + applied merge edges + older bases. Every window is
    safe: per-table floors are derived from each base's own committed
    version; merge edges are pruned LAST, and re-applying a retained edge
    to an already-compacted label is a no-op (resolved labels map to
    themselves). Only versions at or below the meta high water fold — a
    committed-but-unacknowledged batch stays a delta so its replay's
    overwrite cannot double against a base (the growth module's
    replay-floor rule)."""
    meta = _read_meta(table_path)
    hw = meta["high_water"]
    floors = {s: _base_version(table_path, s) for s in ("docs", "buckets")}
    floor = min(floors.values())
    live = [v for v in _visible_versions(table_path) if floor < v <= hw]
    if not live:
        if floor > meta["compacted_through"]:
            # finish an interrupted compaction: meta catch-up (the bases
            # already committed; the fold floor is base-derived so reads
            # were never inconsistent)
            meta["compacted_through"] = floor
            _write_meta(table_path, meta)
        _prune(table_path, floors, meta)
        return
    new_c = max(live)
    # merge map capped at the fold ceiling: a committed-but-unacknowledged
    # batch's merge edges must not bake into the base — its replay rewrites
    # them, and the base staying pre-merge keeps the replay's bytes
    # identical to the original apply
    mm = _merge_map(spark, table_path, below=new_c + 1)
    docs = _resolve(
        _read_table(spark, table_path, "docs", _DOCS_SCHEMA, below=new_c + 1),
        mm,
    )
    buckets = _resolve(
        _read_table(
            spark, table_path, "buckets", _BUCKETS_SCHEMA, below=new_c + 1
        ),
        mm,
    )
    docs.select("doc_id", "label").write.mode("overwrite").parquet(
        f"{table_path}/docs_base/v={new_c}"
    )
    buckets.select("band", "band_hash", "label").write.mode(
        "overwrite"
    ).parquet(f"{table_path}/buckets_base/v={new_c}")
    meta["compacted_through"] = new_c
    _write_meta(table_path, meta)
    _prune(
        table_path,
        {"docs": new_c, "buckets": new_c},
        meta,
    )


def _prune(table_path: str, floors: dict, meta: dict) -> None:
    """Remove deltas folded into a base, older base generations, and
    merge edges applied by BOTH bases (the min floor — after a crash
    between the two base writes the lagging table still needs them)."""
    merge_floor = min(floors.values())
    for sub, floor in floors.items():
        root = os.path.join(table_path, sub)
        if os.path.isdir(root):
            for name in os.listdir(root):
                if name.startswith("v=") and int(name.split("=", 1)[1]) <= floor:
                    shutil.rmtree(os.path.join(root, name))
        base_root = os.path.join(table_path, f"{sub}_base")
        if os.path.isdir(base_root):
            for name in os.listdir(base_root):
                if name.startswith("v=") and int(name.split("=", 1)[1]) < floor:
                    shutil.rmtree(os.path.join(base_root, name))
    merges_root = os.path.join(table_path, "merges")
    if os.path.isdir(merges_root):
        for name in os.listdir(merges_root):
            if name.startswith("v=") and int(name.split("=", 1)[1]) <= merge_floor:
                shutil.rmtree(os.path.join(merges_root, name))


def dedup_stream_writer(
    documents: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    n: int = 3,
    bands: int = dedup.LSH_BANDS,
    rows: int = dedup.LSH_ROWS,
    compact_every: int | None = None,
):
    """A configured ``writeStream`` (foreachBatch) that maintains the
    dup-cluster table under a live document stream; the caller picks the
    trigger and calls ``.start()``. Drained ≡ batch is pinned in
    tests/test_streaming_dedup_index.py."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        dedup_apply_batch(batch_df, batch_id, table_path, n, bands, rows)
        if compact_every:
            meta = _read_meta(table_path)
            if meta["high_water"] - meta["compacted_through"] >= compact_every:
                dedup_compact(batch_df.sparkSession, table_path)

    return (
        documents.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
