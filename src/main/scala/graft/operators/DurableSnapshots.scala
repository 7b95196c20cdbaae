package graft.operators

import org.apache.spark.sql.DataFrame

/** The one implementation of the package's durable-truncation pattern:
  * `None` severs lineage with `localCheckpoint` (right for local mode —
  * the snapshot lives in executor block storage and dies with the app);
  * `Some(dir)` writes the frame to parquet under a fixed name and reads
  * it back — reliable truncation for cluster runs, with no
  * session-global `setCheckpointDir` mutation. Callers own the cleanup
  * contract (see each operator's scaladoc): snapshots use fixed names,
  * so every concurrent or result-overlapping call needs a distinct dir.
  */
private[operators] object DurableSnapshots {

  /** Truncate `df`'s lineage — parquet round-trip under
    * `dir/<sub>` when a reliable dir is given, `localCheckpoint`
    * otherwise.
    */
  def truncate(df: DataFrame, dir: Option[String], sub: String): DataFrame =
    dir match {
      case Some(d) =>
        val path = s"$d/$sub"
        df.write.mode("overwrite").parquet(path)
        df.sparkSession.read.parquet(path)
      case None => df.localCheckpoint()
    }

  /** [[truncate]] for PAYLOAD-CARRYING, corpus-sized frames (shingle
    * sets, fingerprints, artifact tables): local mode snapshots at
    * `DISK_ONLY` instead of `localCheckpoint`'s memory-and-disk
    * default. These frames are read back sequentially by id-keyed
    * joins, so disk is the right tier — holding them in unified
    * memory starves the joins that consume them: the r11 100× sweep
    * (500 k docs) measured q58 dying in AQE's broadcast build because
    * ~GBs of snapshot blocks had the storage pool (the fix measured
    * there; gated scales are unaffected — the frames are tiny). Loop
    * frames (labels, edges, candidate ids) stay on [[truncate]]:
    * they're touched every round and small. Durable mode is already
    * parquet — nothing changes.
    */
  def truncateBulky(df: DataFrame, dir: Option[String], sub: String): DataFrame =
    dir match {
      case Some(_) => truncate(df, dir, sub)
      case None => df.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    }

  /** Best-effort recursive delete of a snapshot path (no-op when the
    * path does not exist).
    */
  def delete(df: DataFrame, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      .delete(p, true)
  }
}

