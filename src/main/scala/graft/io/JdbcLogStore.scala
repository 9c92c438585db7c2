package graft.io

import java.sql.{Connection, DriverManager}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Metastore-backed [[LogStore]] over a JDBC database — the external
 * commit-coordinator deployment shape for object stores WITHOUT
 * put-if-absent (the S3 caveat the Delta/Iceberg ecosystems solve
 * with a DynamoDB/JDBC coordinator): the DATABASE decides every race
 * and holds the authoritative copy of each small metadata file.
 *
 *  - CLAIM: `createExclusive` is a primary-key INSERT — the unique
 *    constraint IS the compare-and-swap, enforced by the database
 *    against every concurrent writer in every process. The slot file
 *    is still created afterwards (winner only) so filesystem listings
 *    and age sweeps keep working, but exclusivity never rests on it.
 *  - PUBLISH: `writeAtomic` upserts the content transactionally; the
 *    marker file on the filesystem is a best-effort mirror for
 *    listings. A reader can never observe a partial file because the
 *    authoritative read path is the DB row (single transactional
 *    value), not the file bytes.
 *  - READ: `readSmall` serves from the DB when a row exists and falls
 *    back to the file for metadata that predates the store switch.
 *
 * Configure via `spark.graft.logstore.jdbc.url`. Conformance-tested
 * against embedded Derby (ships with Spark's Hive-metastore support);
 * any ACID JDBC target with unique constraints behaves identically —
 * a managed Postgres/MySQL plays the role DynamoDB plays for Delta on
 * S3. Driver-side metadata traffic only (a handful of rows per
 * commit), so the one shared connection, serialized per call, is not
 * a throughput concern; cross-process concurrency is arbitrated by
 * the database itself.
 */
class JdbcLogStore extends LogStore {

  private[this] var conn: Connection = _

  override def init(spark: SparkSession): Unit = synchronized {
    val url = spark.conf.get(JdbcLogStore.UrlKey, null)
    require(url != null,
      s"${JdbcLogStore.UrlKey} must be set to use JdbcLogStore")
    conn = DriverManager.getConnection(url)
    conn.setAutoCommit(true)
    val st = conn.createStatement()
    try st.executeUpdate(
      "CREATE TABLE graft_log (p VARCHAR(2048) NOT NULL PRIMARY KEY, c CLOB)")
    catch {
      // X0Y32: table already exists (Derby); 42S01/42P07 elsewhere
      case e: java.sql.SQLException
        if Set("X0Y32", "42S01", "42P07")(e.getSQLState) => ()
    } finally st.close()
  }

  /** Stable row key: the fully-qualified URI of the path. */
  private def key(f: FileSystem, p: Path): String =
    f.makeQualified(p).toUri.toString

  def createExclusive(f: FileSystem, p: Path): Boolean = {
    val won = synchronized {
      val ps = conn.prepareStatement("INSERT INTO graft_log (p) VALUES (?)")
      try { ps.setString(1, key(f, p)); ps.executeUpdate(); true }
      catch {
        // 23505 (Derby/Postgres) / 23xxx class: unique violation —
        // lost the race. Anything else (connectivity, permissions)
        // must SURFACE, never silently burn slot probes.
        case e: java.sql.SQLException
          if Option(e.getSQLState).exists(_.startsWith("23")) => false
      } finally ps.close()
    }
    // The DB row IS the claim (listClaims answers from it immediately),
    // but the winner still mirrors a slot file for age-based stale-claim
    // sweeps. Mirror creation must not fail silently: a claim whose
    // mirror never lands would have no modification time for the sweep
    // to age out — so on mirror failure the row is rolled back and the
    // error SURFACES (the caller never held the slot).
    if (won) {
      try f.create(p, true).close()
      catch {
        case e: Throwable =>
          delete(f, p)
          throw new java.io.IOException(
            s"claimed ${key(f, p)} in the metastore but the filesystem " +
              "mirror failed; claim rolled back", e)
      }
    }
    won
  }

  /** Claims are discovered from the DATABASE — the same substrate the
    * CAS wins on — so an in-flight writer is visible to the structural-
    * commit guards the instant its INSERT commits, with no window where
    * only the best-effort mirror file would reveal it. Unioned with the
    * filesystem listing for claims predating the store switch. */
  override def listClaims(f: FileSystem, dir: Path): Seq[String] = {
    val prefix = key(f, dir) + "/.claim-"
    // escape LIKE metacharacters in the path prefix (paths routinely
    // contain '_', which LIKE would treat as a wildcard)
    val escaped = prefix.replace("!", "!!").replace("%", "!%")
      .replace("_", "!_")
    val fromDb = synchronized {
      val ps = conn.prepareStatement(
        "SELECT p FROM graft_log WHERE p LIKE ? ESCAPE '!'")
      try {
        ps.setString(1, escaped + "%")
        val rs = ps.executeQuery()
        try {
          val out = Seq.newBuilder[String]
          while (rs.next()) out += rs.getString(1).stripPrefix(prefix)
          out.result()
        } finally rs.close()
      } finally ps.close()
    }
    // names with a '/' are deeper than dir (not this log's claims)
    (fromDb.filterNot(_.contains("/")).map(".claim-" + _) ++
      super.listClaims(f, dir)).distinct
  }

  /** Reclamation frees the AUTHORITATIVE row (re-opening the slot for
    * `createExclusive`) and the mirror file. */
  override def delete(f: FileSystem, p: Path): Unit = {
    synchronized {
      val ps = conn.prepareStatement("DELETE FROM graft_log WHERE p = ?")
      try { ps.setString(1, key(f, p)); ps.executeUpdate(); () }
      finally ps.close()
    }
    f.delete(p, false)
    ()
  }

  def writeAtomic(f: FileSystem, p: Path, content: String): Unit = {
    val k = key(f, p)
    synchronized {
      val up = conn.prepareStatement("UPDATE graft_log SET c = ? WHERE p = ?")
      val updated =
        try { up.setString(1, content); up.setString(2, k); up.executeUpdate() }
        finally up.close()
      if (updated == 0) {
        val ins = conn.prepareStatement(
          "INSERT INTO graft_log (p, c) VALUES (?, ?)")
        try { ins.setString(1, k); ins.setString(2, content); ins.executeUpdate() }
        catch {
          case e: java.sql.SQLException
            if Option(e.getSQLState).exists(_.startsWith("23")) =>
              // claimed concurrently between UPDATE and INSERT: update
              val up2 = conn.prepareStatement(
                "UPDATE graft_log SET c = ? WHERE p = ?")
              try { up2.setString(1, content); up2.setString(2, k)
                up2.executeUpdate(); () }
              finally up2.close()
        } finally ins.close()
      }
    }
    // best-effort filesystem mirror for listings/age sweeps — the DB
    // row above is what readers consume
    val out = f.create(p, true)
    out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  def readSmall(f: FileSystem, p: Path): String = {
    val fromDb = synchronized {
      val ps = conn.prepareStatement("SELECT c FROM graft_log WHERE p = ?")
      try {
        ps.setString(1, key(f, p))
        val rs = ps.executeQuery()
        try if (rs.next()) Option(rs.getString(1)) else None
        finally rs.close()
      } finally ps.close()
    }
    fromDb.getOrElse {
      // metadata predating the store switch lives only as a file
      val in = f.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
  }
}

object JdbcLogStore {

  /** Session config key carrying the JDBC URL (read once, at
    * [[LogStore.forSession]]'s construction of the instance). */
  val UrlKey = "spark.graft.logstore.jdbc.url"
}
