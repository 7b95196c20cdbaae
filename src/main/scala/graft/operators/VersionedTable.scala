package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table publish — atomic batch publication with readers
  * isolated from in-flight writes, the minimal form of the snapshot
  * discipline table formats (Iceberg/Delta) provide, built from two
  * filesystem primitives only:
  *
  *  - each publish writes a COMPLETE new version directory `v=N/`
  *    (never mutating a live one), then
  *  - flips a single `_latest` pointer file via write-temp +
  *    atomic-rename.
  *
  * Readers resolve the pointer first, so they see either the old or
  * the new version in full — never a half-written directory. A crash
  * after the data write but before the pointer flip leaves an orphan
  * `v=N` that the next publish simply supersedes (and `vacuumVersions`
  * removes); a crash during the pointer rename is atomic at the FS
  * level. Old versions stay readable by number (time travel) until
  * vacuumed — the rollback story is "point the pointer back", not a
  * restore.
  *
  * At 100 TB the same layout works on object stores that offer atomic
  * single-object put (the pointer is one small object); the version
  * directories pair with [[PartitionedLake.compact]] for layout and
  * [[PartitionedLake.vacuumPartitions]]-style retention inside a
  * version. Reference context: the reference overwrites each zone
  * in place (`curated_layer.py:88-89`) — an in-flight reader there
  * can see a truncated table, exactly what the pointer prevents.
  */
object VersionedTable {

  private def pointerPath(root: String) = java.nio.file.Paths.get(root, "_latest")

  /** Highest published version, if any (resolves the pointer, not the
    * directory listing — orphaned crash leftovers are invisible).
    */
  def latestVersion(root: String): Option[Long] = {
    val p = pointerPath(root)
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim.toLong)
    else None
  }

  /** Publish `df` as the next version and flip the pointer. Returns
    * the published version number. The next number clears BOTH the
    * pointer and any existing `v=` directory — a crash between data
    * write and pointer flip leaves an orphan directory, and the next
    * publish must step over it, not collide with it.
    */
  def publish(df: DataFrame, root: String): Long = {
    val next = nextVersion(root)
    df.write.mode("errorifexists").parquet(s"$root/v=$next")
    flipPointer(root, next)
    next
  }

  /** Next version number, stepping over BOTH the pointer target and
    * any orphan `v=` directory a crash left behind.
    */
  private def nextVersion(root: String): Long = {
    val maxDir = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .maxOption.getOrElse(0L)
    math.max(latestVersion(root).getOrElse(0L), maxDir) + 1L
  }

  /** The single commit point: write-temp + atomic rename. Shared by
    * both publish paths so the crash/atomicity protocol can never
    * fork between them.
    */
  private def flipPointer(root: String, version: Long): Unit = {
    val tmp = java.nio.file.Paths.get(root, s"_latest.tmp.$version")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    java.nio.file.Files.writeString(tmp, version.toString)
    java.nio.file.Files.move(tmp, pointerPath(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the current version (pointer-resolved snapshot). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    readVersion(spark, root, v)
  }

  /** Time travel: read an explicit version. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(s"$root/v=$version")

  /** Atomic MULTI-TABLE snapshot publish: all tables of a derived
    * schema (fact + dims) written under one `v=N/<table>/` tree and
    * exposed by the same single pointer flip — a reader can never see
    * fact v2 joined against dim v1, the torn-star hazard the
    * reference's four independent in-place overwrites
    * (`curated_layer.py:88-144`) leave open. Same crash semantics as
    * [[publish]]: an interrupted multi-table write leaves an orphan
    * version invisible to readers.
    */
  def publishAll(tables: Map[String, DataFrame], root: String): Long = {
    require(tables.nonEmpty, "nothing to publish")
    tables.keys.foreach(requireSafeTableName)
    val next = nextVersion(root)
    tables.foreach { case (name, df) =>
      df.write.mode("errorifexists").parquet(s"$root/v=$next/$name")
    }
    flipPointer(root, next)
    next
  }

  // a table name is one PLAIN path segment inside the version dir —
  // '..' (or a '/'/'\\') would escape the snapshot tree and write
  // next to the pointer itself
  private def requireSafeTableName(n: String): Unit =
    require(n.nonEmpty && n.matches("[A-Za-z0-9][A-Za-z0-9_.-]*") &&
      n != "." && n != ".." && !n.startsWith("v="),
      s"unsafe table name '$n': must be a plain identifier segment")

  /** Read one table of the current multi-table snapshot. */
  def readTable(spark: SparkSession, root: String, table: String): DataFrame = {
    requireSafeTableName(table)
    val v = latestVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    spark.read.parquet(s"$root/v=$v/$table")
  }

  /** Drop version directories older than the newest `keepLast`
    * (pointer target always survives). Returns dropped versions.
    */
  def vacuumVersions(root: String, keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the live version")
    val live = latestVersion(root).getOrElse(return Nil)
    val dir = new java.io.File(root)
    val versions = dir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(f => (f, f.getName.stripPrefix("v=").toLong))
    val cutoff = versions.map(_._2).sorted.takeRight(keepLast).headOption.getOrElse(live)
    val dropped = versions.filter { case (_, v) => v < cutoff && v != live }
    dropped.foreach { case (d, _) =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        if (!f.delete()) throw new java.io.IOException(s"could not delete $f")
      }
      rm(d)
    }
    dropped.map(_._2).sorted
  }
}
