package graft.lake

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal TRANSACTIONAL table on plain parquet — the commit-log
  * pattern (Delta/Iceberg-style, re-derived from the published
  * protocol shape) that gives the engine's mutation verbs (A7 upsert,
  * A13/A14 delete; photo_vector_search.py:94-151 mutates its store in
  * place) reader-safe atomicity on an immutable lake:
  *
  *  - DATA is immutable: every commit writes a fresh fileset under
  *    `data/commit-<v>-<nonce>/` and never touches prior files.
  *  - The MANIFEST is the table: `_manifests/v<N>.json` lists the
  *    exact files of snapshot N. A reader resolves max(N), reads that
  *    list, and is guaranteed a complete snapshot — data files are
  *    fully written BEFORE the manifest appears, and the manifest
  *    appears atomically (written to a temp name, then claimed with
  *    an atomic no-replace link).
  *  - CONCURRENT writers serialize optimistically: the link onto
  *    `v<N>.json` succeeds for exactly one writer (the filesystem's
  *    no-replace link is the compare-and-swap); the loser re-reads
  *    the new current snapshot, re-applies its transform, and retries
  *    at N+1 — so commits are serializable transforms, never
  *    lost-update blind writes.
  *
  * On a real cluster the same protocol runs against an object store
  * with a conditional-put (the rename here) and the data writes are
  * distributed parquet jobs — nothing in the shape is driver-sized:
  * the manifest is O(files), not O(rows), and each commit's data job
  * is an ordinary Spark write. Readers pay zero coordination.
  */
final class ManifestTable private (val root: String, spark: SparkSession) {

  private def manifestDir = Paths.get(root, "_manifests")

  /** Highest committed version, 0 if the table is empty of commits. */
  def currentVersion(): Int = {
    val files = Option(manifestDir.toFile.listFiles()).getOrElse(Array.empty)
    val vs = files.map(_.getName).collect {
      case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt
    }
    if (vs.isEmpty) 0 else vs.max
  }

  private def manifestFiles(v: Int): Seq[String] = {
    val txt = new String(
      Files.readAllBytes(manifestDir.resolve(s"v$v.json")), UTF_8)
    // {"version":N,"files":["p1","p2",...]} — no nesting, so a split
    // on quoted list entries is a full parser for what we write.
    val start = txt.indexOf("[")
    val end = txt.lastIndexOf("]")
    txt.substring(start + 1, end).split(",").toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
  }

  /** Snapshot read at the current version — a plain parquet scan of
    * the manifest's file list (partition pruning, pushdown, and
    * column pruning all apply as usual). */
  def read(): DataFrame = readAt(currentVersion())

  def readAt(v: Int): DataFrame = {
    require(v >= 1, s"no committed version at $root")
    spark.read.parquet(manifestFiles(v): _*)
  }

  /** Serializable commit: `transform` maps the current snapshot to
    * the next one. On a version race the transform is RE-APPLIED to
    * the winner's snapshot (optimistic concurrency), so concurrent
    * commits compose instead of overwriting each other. Returns the
    * committed version. */
  def commit(transform: DataFrame => DataFrame): Int =
    commitLoop(v => transform(readAt(v)))

  private[lake] def commitLoop(make: Int => DataFrame): Int = {
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 20, s"commit contention not resolving at $root")
      val v = currentVersion()
      val next = make(v)
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val dataDir = s"$root/data/commit-${v + 1}-$nonce"
      next.write.mode("overwrite").parquet(dataDir)
      val parts = Option(new File(dataDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).sorted
      if (tryPublish(v + 1, parts.toSeq)) return v + 1
      // else: another writer claimed v+1 first — loop re-reads and
      // re-applies; our orphaned fileset is unreachable garbage a
      // vacuum would collect (never visible to any reader).
    }
    -1 // unreachable
  }

  /** The linearization point: publish v<N>.json by hard-LINKING the
    * fully-written temp file onto the version name. createLink is the
    * local filesystem's atomic compare-and-swap — it fails with
    * FileAlreadyExistsException if the name is taken (POSIX rename
    * would silently REPLACE, which is exactly not a CAS), so exactly
    * one writer per version wins, and a reader either sees the
    * complete manifest or nothing. On an object store the same slot
    * is a conditional put (If-None-Match) — the protocol is
    * unchanged. */
  private def tryPublish(v: Int, files: Seq[String]): Boolean = {
    Files.createDirectories(manifestDir)
    val body = files.map("\"" + _ + "\"").mkString(
      s"""{"version":$v,"files":[""", ",", "]}")
    val tmp = Files.createTempFile(manifestDir, s".v$v-", ".tmp")
    Files.write(tmp, body.getBytes(UTF_8))
    try {
      Files.createLink(manifestDir.resolve(s"v$v.json"), tmp)
      true
    } catch {
      case _: FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }
}

object ManifestTable {
  /** Open (or initialize) a table rooted at `root`; `init` seeds
    * version 1 if and only if no commit exists yet. */
  def create(spark: SparkSession, root: String, init: DataFrame): ManifestTable = {
    val t = new ManifestTable(root, spark)
    if (t.currentVersion() == 0) t.commitLoop(_ => init)
    t
  }

  def open(spark: SparkSession, root: String): ManifestTable =
    new ManifestTable(root, spark)
}
