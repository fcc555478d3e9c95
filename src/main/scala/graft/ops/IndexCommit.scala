package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** ONE commit-marker discipline for every multi-directory persisted
  * index (near-dup sig+shingles, BM25 postings+docstats+meta,
  * binary-quant vectors+codes, …) — the z-order staged-swap idea
  * applied to APPENDS, factored out so each family shares the same
  * crash-recovery story instead of growing its own.
  *
  * Protocol (single-writer per index root, the `.lock` contract):
  *   1. writer entry: [[recover]] converges any crashed predecessor;
  *   2. the PRE-mutation data-file listing of every participating
  *      directory persists to `<root>/_append_pending`;
  *   3. the mutation's writes run;
  *   4. the marker deletes — the COMMIT point.
  *
  * Recovery: a surviving marker means a crash inside the window, and
  * every data file NOT in the pre-listing is the crashed mutation's
  * partial output — deleting those reconverges all directories to the
  * exact pre-mutation bytes. Like the z-order "less than both markers"
  * branch this DISCARDS rather than completes (the batch is not
  * durable anywhere, so completion is impossible); the caller's replay
  * re-adds it, and each family's replay guards make that idempotent.
  * A TORN marker (directory exists, no parquet inside) means the crash
  * hit the marker write itself — nothing was mutated, the marker just
  * drops. `postRecover` runs after a real rollback for state the
  * listing cannot restore — DERIVED artifacts that overwrite in place
  * (the BM25 meta) rebuild from the rolled-back relations instead.
  *
  * Why replay-idempotence alone is not enough (the r14 verdict's gap):
  * a crashed half-append leaves the index INCONSISTENT until the same
  * batch happens to be redelivered — e.g. near-dup sig rows whose
  * shingles are missing silently drop their candidate pairs at verify
  * time, and a BM25 crash between the postings and docstats writes
  * would DUPLICATE postings on replay (the batch guard keys docstats,
  * which never saw the batch). The marker closes both holes.
  */
object IndexCommit {

  val MarkerDir = "_append_pending"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data files (relative names) of one participating directory. */
  def dataFiles(fs: FileSystem, dir: Path): Set[String] =
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).toSet

  /** Converge a crashed mutation under `root`. Returns true iff a
    * valid pending marker was found (and the rollback + `postRecover`
    * ran).
    */
  def recover(spark: SparkSession, root: String, dirs: Seq[String],
              refreshTables: Seq[String] = Nil,
              postRecover: () => Unit = () => ()): Boolean = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val pending = new Path(rootP, MarkerDir)
    if (!fs.exists(pending)) false
    else {
      val valid = graft.io.IO.parquetFileCount(spark, pending.toString) > 0
      if (valid) {
        val pre = spark.read.parquet(pending.toString).collect()
          .map(r => (r.getString(0), r.getString(1)))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        for (d <- dirs) {
          val dir = new Path(rootP, d)
          val keep = pre.getOrElse(d, Set.empty[String])
          dataFiles(fs, dir).filterNot(keep).foreach { f =>
            fs.delete(new Path(dir, f), false) }
        }
        refreshTables.foreach { t =>
          if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t) }
      }
      fs.delete(pending, true)
      if (valid) postRecover()
      valid
    }
  }

  /** Entry recovery + pre-listing marker around `body` + commit. */
  def withMarker(spark: SparkSession, root: String, dirs: Seq[String],
                 refreshTables: Seq[String] = Nil,
                 postRecover: () => Unit = () => ())(body: => Unit): Unit = {
    recover(spark, root, dirs, refreshTables, postRecover)
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val pending = new Path(rootP, MarkerDir)
    val pre: Seq[(String, String)] = dirs.flatMap { d =>
      dataFiles(fs, new Path(rootP, d)).toSeq.sorted.map(f => (d, f)) }
    locally {
      import spark.implicits._
      graft.io.IO.writeDir(pre.toDF("half", "file_name"), pending.toString)
    }
    body
    fs.delete(pending, true) // COMMIT
  }
}
