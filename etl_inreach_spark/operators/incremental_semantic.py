"""Incremental semantic dedup: SemDeDup cell verdicts over a growing
embedding corpus, one cell-equi-join per increment.

The 100 TB reality this models, same as operators/incremental_dedup.py
for MinHash: an embedding corpus grows by batches, and re-running the
whole-corpus in-cell pair search per increment is O(corpus) work for
O(batch) new vectors. Here each increment

  1. assigns ITS vectors to cells under a FROZEN coarse quantizer
     (centroids are an argument — production trains the quantizer
     once on an initial sample and reuses it; re-training per batch
     would silently reshuffle cell boundaries and un-define the
     incremental verdict);
  2. probes the persisted per-cell state with ONE equi-join on cell
     (cost ~ |batch| x avg cell density — independent of running the
     full corpus pair search again);
  3. resolves batch-internal pairs with one in-batch cell join
     (~ |batch|^2 / nlist);
  4. appends its rows to the state (idempotent via the same
     batch-marker protocol as sinks/upsert — a replayed batch cannot
     double-ingest).

Contract — MIN-ID WINS, deliberately different from the incremental
MinHash operator's survivor-state/first-ingested-wins:

* The one-shot SemDeDup verdict (semantic_dedup_cells: drop v iff
  some SMALLER-ID in-cell neighbor has cosine >= tau, kept or not)
  is the specification, so the state stores EVERY ingested vector,
  not just survivors, and the drop rule compares against smaller-id
  neighbors only. Consequence (the convergence theorem the oracled
  query pins): for ID-MONOTONE ingestion — batch k's ids all exceed
  batch k-1's, the shape of every append-only pipeline that assigns
  ids monotonically — the labels after N increments EQUAL the
  one-shot verdict over the union, bit for bit. Non-monotone
  ingestion stays well-defined (v is judged against everything
  ingested up to and including its own batch) but can diverge from
  one-shot, since an earlier-id vector arriving later never
  relabels an already-kept row; that is what incremental means.
* Smaller-id-only matching also makes REPLAY idempotent: on a
  re-ingested batch each vector collides with its own stored row
  (cos = 1) and with its batch-mates' stored rows in both
  orientations; the id < filter leaves labels exactly as the first
  run computed them.

State is O(ingested vectors) — embeddings cannot be sketched down
like MinHash band keys without changing the verdict itself (the
cosine needs the vector). It is parquet partitioned by ``cell`` with
the norm precomputed per row, so an increment's probe join reads each
touched cell's directory once and never recomputes history norms.
Hot-cell skew in the probe join is the semantic_dedup_cells story;
increments are small by construction, and a mass-duplicate batch
should be capped by the one-shot operator's triangular grid applied
to the batch BEFORE ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_inreach_spark.functions.vectors import dot, l2_norm
from etl_inreach_spark.operators.similarity import _nearest_cells
from etl_inreach_spark.sinks.upsert import (
    _batch_applied,
    _mark_batch_applied,
    _path_exists,
)


def incremental_semantic_dedup(
    spark: SparkSession,
    batch: DataFrame,
    centroids: DataFrame,
    state_path: str,
    batch_id: str,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Label ``batch`` against the persisted corpus state under the
    frozen ``centroids`` (cell, _cvec) and append the batch's rows.
    Returns (id_col, cell, kept boolean, dup_of nullable) where
    ``dup_of`` is the SMALLEST id among the smaller-id in-cell
    neighbors at cosine >= tau (historical or batch-internal).
    Re-running the same ``batch_id`` is a no-op for state (marker
    protocol) and recomputes identical labels.

    One assignment pass for the batch (checkpointed — consumed by the
    history probe, the in-batch pair join, and the state append), one
    equi-join against state, one batch-internal cell join."""
    asg = _nearest_cells(batch, centroids, 1, id_col, vec_col)
    withn = asg.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        "cell",
        l2_norm(F.col(vec_col)).alias("_nrm"),
    ).localCheckpoint(eager=True)

    pair_cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    new_side = withn.select(
        F.col("_id").alias("_idb"), F.col("_vec").alias("_vb"),
        F.col("_nrm").alias("_nb"), "cell",
    )

    # --- vs history (smaller-id rows only — see module contract) ----
    if _path_exists(spark, state_path):
        hist = spark.read.parquet(state_path).select(
            F.col("_id").alias("_ida"), F.col("_vec").alias("_va"),
            F.col("_nrm").alias("_na"), "cell",
        )
        hist_hits = (
            new_side.join(hist, "cell")
            .filter(F.col("_ida") < F.col("_idb"))
            .filter(pair_cos >= F.lit(tau))
            .select("_idb", "_ida")
        )
    else:
        # derive the empty relation's id type from the batch: a
        # hardcoded bigint would break string/decimal id columns on
        # the FIRST batch only (later batches inherit the real type
        # from the parquet state) — the worst kind of works-later bug
        from pyspark.sql.types import StructField, StructType

        idt = batch.schema[id_col].dataType
        hist_hits = spark.createDataFrame(
            [], StructType([StructField("_idb", idt), StructField("_ida", idt)])
        )

    # --- within batch ------------------------------------------------
    batch_side_a = withn.select(
        F.col("_id").alias("_ida"), F.col("_vec").alias("_va"),
        F.col("_nrm").alias("_na"), "cell",
    )
    batch_hits = (
        batch_side_a.join(new_side, "cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(pair_cos >= F.lit(tau))
        .select("_idb", "_ida")
    )

    # one union + min-agg resolves dup_of across both sources without
    # engine-specific null handling in least()
    dups = (
        hist_hits.unionByName(batch_hits)
        .groupBy("_idb")
        .agg(F.min("_ida").alias("dup_of"))
    )
    labeled = (
        withn.select("_id", "cell")
        .join(dups, withn["_id"] == dups["_idb"], "left")
        .select(
            F.col("_id").alias(id_col),
            "cell",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
        .localCheckpoint(eager=True)
    )

    # --- append the batch's rows (ALL of them — min-id-wins needs
    # dropped rows too; idempotent via the marker protocol) ----------
    if not _batch_applied(spark, state_path, batch_id):
        # repartition ON the partition column first: otherwise every
        # shuffle partition opens a writer per cell it touches and the
        # state accrues n_partitions x nlist tiny files per increment
        # (the classic dynamic-partition small-file explosion); one
        # task per cell writes one file per cell per increment
        (
            withn.repartition("cell")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(state_path)
        )
        _mark_batch_applied(spark, state_path, batch_id)
    return labeled
