package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregates — the composition the
  * whole catalog builds toward: an MV refresh reads ONLY the source
  * snapshots committed since the last refresh (the incremental batch read
  * over manifests), folds them into per-group partials (map-side combine),
  * joins the touched groups' current values, and UPSERTS only those groups
  * through the equality-delete path. Refresh cost is O(delta + touched
  * groups) — on a 100 TB fact table a refresh after an hourly load touches
  * the hour's files and the affected groups, never the table.
  *
  * Exactly-once: the refresh WATERMARK (`mv.last-snapshot`) rides the same
  * CAS commit as the upserted rows, so a crashed refresh either happened
  * entirely or not at all — replaying it is a no-op.
  *
  * Counts are BIGINT; sums accumulate as DECIMAL(18,6) (exact,
  * order-independent), so an incrementally-maintained MV is BIT-IDENTICAL
  * to the from-scratch aggregate — q75 proves it against DuckDB computing
  * the aggregate from raw rows.
  *
  * Non-append sources: when the refresh range contains row-CHANGING
  * commits (upsert epochs, merge-on-read DELETE/UPDATE deltas), the
  * refresh reads the CDC CHANGELOG instead of the append delta and folds
  * it with RETRACTION — count/sum are signed-additive (+row for insert,
  * -row for delete), still exact under decimal accumulation. min/max
  * cannot retract, so an MV WITH min/max columns recomputes exactly the
  * touched groups from the source's current state (cost O(changelog +
  * touched groups' source rows) — partition/stats pruning applies when
  * the source clusters by the group columns). A group whose count reaches
  * zero keeps a cnt=0 tombstone row (the upsert path cannot delete rows);
  * read MVs with `WHERE cnt > 0`. Ranges the changelog itself cannot
  * express (compaction/overwrite/z-order rewrites) still fail fast —
  * refresh before maintenance, or rebuild.
  */
object Materialized {

  /** Create the MV table for `SELECT group_cols, count(*), sum(sum_cols)
    * FROM source GROUP BY group_cols`, with the maintenance contract in
    * its properties. Columns: the group columns (source types), `cnt`
    * BIGINT, and one `sum_<c>` DECIMAL(18,6) per sum column.
    */
  def createAggregate(spark: SparkSession, mvTable: String, sourceTable: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      partitioned: Boolean = false): Unit = {
    require(groupCols.nonEmpty, "materialized aggregate needs at least one group column")
    val (_, _, src) = LakeMaintenance.resolve(spark, sourceTable)
    val srcSchema = src.meta.schema
    (groupCols ++ sumCols ++ minCols ++ maxCols).foreach(c =>
      require(srcSchema.fieldNames.contains(c), s"'$c' is not a column of $sourceTable"))
    def srcType(c: String) = srcSchema(srcSchema.fieldIndex(c)).dataType.sql
    val ns = mvTable.split('.').dropRight(1).mkString(".")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
    val groupDdl = groupCols.map(c => s"$c ${srcType(c)}")
    // count + sum are additive; min/max are MONOTONE under the append-only
    // sources refresh supports (least/greatest of old and delta) — all
    // incrementally exact. avg = sum_c / cnt at query time.
    val sumDdl = sumCols.map(c => s"sum_$c DECIMAL(18,6)")
    val minDdl = minCols.map(c => s"min_$c ${srcType(c)}")
    val maxDdl = maxCols.map(c => s"max_$c ${srcType(c)}")
    // partitioned = true clusters the MV by its group columns: refresh
    // upserts cluster per group value and a point read of one group is a
    // partition-pruned file lookup — the right layout once the group space
    // is large enough to matter
    val partClause = if (partitioned) s"PARTITIONED BY (${groupCols.mkString(", ")})" else ""
    spark.sql(s"""CREATE TABLE $mvTable (
      |${(groupDdl ++ Seq("cnt BIGINT") ++ sumDdl ++ minDdl ++ maxDdl).mkString(", ")})
      |$partClause
      |TBLPROPERTIES (
      |  'mv.source' = '$sourceTable',
      |  'mv.group-by' = '${groupCols.mkString(",")}',
      |  'mv.sum' = '${sumCols.mkString(",")}',
      |  'mv.min' = '${minCols.mkString(",")}',
      |  'mv.max' = '${maxCols.mkString(",")}',
      |  'mv.last-snapshot' = '0')""".stripMargin)
  }

  /** Fold the source snapshots committed since the last refresh into the
    * MV. Returns (groups upserted, mv snapshot id) — (0, current) when
    * there is nothing new.
    */
  def refresh(spark: SparkSession, mvTable: String): (Long, Long) = {
    val (_, _, mv) = LakeMaintenance.resolve(spark, mvTable)
    val props = mv.meta.properties
    val source = props.getOrElse("mv.source", throw new IllegalArgumentException(
      s"$mvTable is not a materialized aggregate (no mv.source property)"))
    def colsOf(k: String) = props.getOrElse(k, "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val groupCols = colsOf("mv.group-by")
    val sumCols = colsOf("mv.sum")
    val minCols = colsOf("mv.min")
    val maxCols = colsOf("mv.max")
    val last = props.getOrElse("mv.last-snapshot", "0").toLong
    val srcMeta = LakeMaintenance.resolve(spark, source)._3.meta
    val cur = srcMeta.currentSnapshotId
    if (cur <= last) return (0L, mv.meta.currentSnapshotId)

    // classify the refresh range by walking the main lineage (parent
    // chain; id-order fallback for legacy docs) — same walk the
    // incremental readers use
    val appendOps = Set("append", "stream-append", "branch-append", "create",
      "stage-append", "publish", "rewrite-manifests", "rewrite-deletes", "add_files")
    val chainOps: Seq[String] = {
      var acc = List.empty[String]
      var curId = cur
      var legacy = false
      while (curId > last && !legacy) {
        srcMeta.snapshot(curId) match {
          case Some(s) if s.parentId > 0 => acc = s.operation :: acc; curId = s.parentId
          case _ => legacy = true
        }
      }
      if (!legacy) acc
      else srcMeta.snapshots.filter(s => s.snapshotId > last && s.snapshotId <= cur)
        .map(_.operation)
    }

    val combined: org.apache.spark.sql.DataFrame =
      if (chainOps.forall(appendOps)) {
        // append-only fast path: fold ONLY the new snapshots' files
        val delta = spark.read
          .option("start-snapshot-id", last.toString)
          .option("end-snapshot-id", cur.toString)
          .table(source)
        val partial = delta.groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("cnt"),
            sumCols.map(c => sum(col(c).cast("decimal(18,6)")).as(s"sum_$c")) ++
              minCols.map(c => min(col(c)).as(s"min_$c")) ++
              maxCols.map(c => max(col(c)).as(s"max_$c")): _*)
        // merge the touched groups with their current MV values (left join:
        // rows ∝ touched groups, and only those groups are upserted)
        val existing = spark.table(mvTable)
        partial.as("d").join(existing.as("m"), groupCols, "left")
          .select(groupCols.map(col) ++
            Seq((col("d.cnt") + coalesce(col("m.cnt"), lit(0L))).as("cnt")) ++
            sumCols.map(c =>
              (col(s"d.sum_$c") + coalesce(col(s"m.sum_$c"), lit(0).cast("decimal(18,6)")))
                .cast("decimal(18,6)").as(s"sum_$c")) ++
            minCols.map(c =>
              least(col(s"d.min_$c"), coalesce(col(s"m.min_$c"), col(s"d.min_$c")))
                .as(s"min_$c")) ++
            maxCols.map(c =>
              greatest(col(s"d.max_$c"), coalesce(col(s"m.max_$c"), col(s"d.max_$c")))
                .as(s"max_$c")): _*)
      } else if (minCols.isEmpty && maxCols.isEmpty) {
        // row-changing range, additive aggregates only: fold the CDC
        // changelog with RETRACTION — +row for inserts, -row for deletes;
        // decimal accumulation keeps the result bit-identical to
        // from-scratch. (changelog validates the range itself and fails
        // fast on rewrites it cannot express.)
        val changes = LakeMaintenance.changelog(spark, source, last, cur)
          .withColumn("__sign",
            when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
        val partial = changes.groupBy(groupCols.map(col): _*)
          .agg(sum(col("__sign")).as("cnt"),
            sumCols.map(c =>
              sum(col(c).cast("decimal(18,6)") * col("__sign"))
                .cast("decimal(18,6)").as(s"sum_$c")): _*)
        val existing = spark.table(mvTable)
        partial.as("d").join(existing.as("m"), groupCols, "left")
          .select(groupCols.map(col) ++
            Seq((col("d.cnt") + coalesce(col("m.cnt"), lit(0L))).as("cnt")) ++
            sumCols.map(c =>
              (col(s"d.sum_$c") + coalesce(col(s"m.sum_$c"), lit(0).cast("decimal(18,6)")))
                .cast("decimal(18,6)").as(s"sum_$c")): _*)
      } else {
        // min/max cannot retract: recompute EXACTLY the touched groups
        // from the source's current state; groups that vanished get a
        // cnt=0 tombstone (the upsert path cannot delete MV rows)
        val touched = LakeMaintenance.changelog(spark, source, last, cur)
          .select(groupCols.map(col): _*).distinct()
        // pinned at `cur`: a commit racing this refresh must not leak past
        // the watermark this fold will record
        val recomputed = spark.read.option("snapshot-id", cur.toString).table(source)
          .join(touched, groupCols, "left_semi")
          .groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("cnt"),
            sumCols.map(c => sum(col(c).cast("decimal(18,6)")).as(s"sum_$c")) ++
              minCols.map(c => min(col(c)).as(s"min_$c")) ++
              maxCols.map(c => max(col(c)).as(s"max_$c")): _*)
        val gone = touched.join(recomputed.select(groupCols.map(col): _*),
            groupCols, "left_anti")
          .select(groupCols.map(col) ++
            Seq(lit(0L).as("cnt")) ++
            sumCols.map(c => lit(0).cast("decimal(18,6)").as(s"sum_$c")) ++
            minCols.map(c => lit(null).cast(
              spark.table(mvTable).schema(s"min_$c").dataType).as(s"min_$c")) ++
            maxCols.map(c => lit(null).cast(
              spark.table(mvTable).schema(s"max_$c").dataType).as(s"max_$c")): _*)
        recomputed.unionByName(gone)
      }

    // the watermark rides the SAME commit as the rows: exactly-once. The
    // upsert's own committed row count IS the touched-group count — no
    // separate count() job materializing the join twice. The watermark
    // PRECONDITION makes racing refreshes safe: whoever commits second
    // sees the moved watermark and gets a conflict instead of folding the
    // same delta twice.
    LakeMaintenance.upsert(spark, mvTable, combined, groupCols,
      extraProps = Map("mv.last-snapshot" -> cur.toString),
      requireProps = Map("mv.last-snapshot" -> last.toString))
  }
}
