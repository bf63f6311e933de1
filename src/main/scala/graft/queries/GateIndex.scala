package graft.queries

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the build-once/probe-many index gates (BM25
  * postings, fingerprint/minhash/winnow dedup indexes, SemDeDup anchors).
  *
  * The gate keys its warehouse tables to [[gatePrefix]] and skips the
  * build when the index for that key already exists: the bench's
  * best-of-2 then times the probe plan — the production shape, where a
  * daily batch never rebuilds the corpus index — instead of re-timing
  * saveAsTable construction on every invocation. [[gatePrefix]]
  * additionally garbage-collects keys superseded by a regeneration of
  * the SAME data directory, so regenerated datasets don't grow the
  * warehouse unboundedly.
  */
object GateIndex {

  /** Content-stamped fingerprint of a data directory: mixes the path with
    * every file's (name, size, mtime). Keying index tables on this rather
    * than the bare path means a REGENERATED dataset at the same path gets
    * a fresh key — a stale persisted index can never silently serve rows
    * from a previous corpus generation. Stat-only (no data read), so the
    * stamp costs microseconds even on a large directory.
    *
    * Stats through the Hadoop FileSystem API, so the stamp covers every
    * scheme Spark can read (hdfs://, s3a://, file:) — a java.nio stat
    * would silently degrade remote dirs to a bare path hash. A LISTING
    * FAILURE on an existing path propagates instead of degrading: a
    * silently path-hashed key would both stop tracking regenerations
    * (stale-index hazard) and churn the GC. A path that doesn't exist
    * (yet) keeps the path-only hash: no data means no stale-serving risk,
    * and the key changes as soon as content appears. */
  def dirKey(dir: String): String =
    java.lang.Long.toHexString(contentStamp(dir))

  private def contentStamp(dir: String): Long = {
    var acc = dir.hashCode.toLong
    // the active session's Hadoop conf carries cluster fs settings;
    // outside a session (unit tests) the default conf still serves file:
    val hconf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hconf)
    if (fs.exists(p)) {
      // Commutative per-file mix: listing order is filesystem-dependent,
      // so the stamp must not depend on iteration order.
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile) {
          acc += (f.getPath.getName.hashCode.toLong * 1000003L) ^
            (f.getLen * 31L) ^ f.getModificationTime
        }
      }
    }
    acc
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Path-only component, independent of content: two datasets at
    * different paths NEVER share it, so the GC can scope deletions to
    * "same family, same directory, different content". Full 64 bits of
    * an md5 (ADVICE r13: the previous 32-bit truncated String.hashCode
    * put a cross-directory collision — i.e. one directory's GC deleting
    * another's live index — at birthday reach for ~2^16 dirs; at 64 bits
    * it is negligible). */
  private def pathKey(dir: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(8).map(b => f"$b%02x").mkString
  }

  private val gcDone =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The content-keyed table-name prefix for a gate family, with stale-key
    * GARBAGE COLLECTION: the name is `family_p<pathKey>_<contentKey>`, and
    * any catalog table or warehouse directory with the same family AND
    * path component but a different content key is — by construction — a
    * superseded generation of this same dataset, so it is dropped. Tables
    * the family built for OTHER directories have a different path
    * component and are never touched. Without the GC, every dataset
    * regeneration mints a new key while the old content-stamped index
    * tables accumulate forever. */
  def gatePrefix(spark: SparkSession, family: String, dir: String): String = {
    val scope = s"${family}_p${pathKey(dir)}"
    val current = s"${scope}_${dirKey(dir)}"
    // GC once per (family, key) per JVM: catalog listTables on the
    // Derby-backed metastore costs real milliseconds, and a re-probe of
    // an unchanged dataset has nothing to collect
    if (!gcDone.add(current)) return current
    // Collectable: a superseded generation of THIS directory under the
    // current 64-bit path component — nothing else. The `family_*`
    // wildcard arm died in r14 (ADVICE r13: it could reach tables this
    // GC never created) and the 32-bit migration arm — opt-in in r15 —
    // is DELETED in r16 (its migration window is over; a 32-bit path key
    // can collide across directories, so any remaining pre-r14 leftovers
    // are for the operator to drop by exact name). Every deletion is
    // logged, and failures log loudly instead of silently swallowing (a
    // GC that can't list the warehouse should say so, not pretend it
    // collected).
    def stale(n: String): Boolean =
      n.startsWith(s"${scope}_") && !n.startsWith(current)
    def logDrop(n: String, what: String): Unit =
      log.info(s"GateIndex GC: dropping superseded $what $n " +
        s"(current generation: $current, data dir: $dir)")
    try {
      // catalog entries from this or earlier sessions
      spark.catalog.listTables().collect()
        .map(_.name)
        .filter(stale)
        .foreach { n =>
          logDrop(n, "index table")
          dropGateTable(spark, n)
        }
      // orphaned warehouse dirs no catalog knows (earlier JVMs). Scoped
      // by the same 64-bit (family, path) component as the catalog sweep,
      // so only directories THIS gate family minted for THIS data dir are
      // reachable — a co-tenant application's tables can't match.
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) {
        fs.listStatus(wh).foreach { st =>
          if (stale(st.getPath.getName)) {
            logDrop(st.getPath.toString, "orphaned warehouse dir")
            fs.delete(st.getPath, true)
          }
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"GateIndex GC for $current failed (superseded index " +
          s"generations may accumulate until a later sweep succeeds)", e)
    }
    current
  }

  /** One-time retirement drop for a RENAMED gate family (ADVICE r15):
    * r15 renamed the indexed-graph family graft_pr_gate →
    * graft_graph_gate, which orphaned any deployment's existing
    * graft_pr_gate generations forever — the GC is family-scoped and
    * nothing probes the old family anymore. This sweeps the retired
    * family's tables and warehouse dirs for THIS directory, scoped by
    * the exact `retired_p<64-bit pathKey>_` prefix (the same reach
    * discipline as the live GC — name-coincident tables the family
    * never minted can't match). Memoized per (family, dir) per JVM. */
  def dropRetiredFamily(spark: SparkSession, retired: String,
                        dir: String): Unit = {
    val scope = s"${retired}_p${pathKey(dir)}_"
    if (!gcDone.add(scope)) return
    try {
      spark.catalog.listTables().collect()
        .map(_.name)
        .filter(_.startsWith(scope))
        .foreach { n =>
          log.info(s"GateIndex GC: dropping retired-family index table $n " +
            s"(family $retired superseded; data dir: $dir)")
          dropGateTable(spark, n)
        }
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) {
        fs.listStatus(wh).foreach { st =>
          if (st.getPath.getName.startsWith(scope)) {
            log.info(s"GateIndex GC: dropping retired-family warehouse " +
              s"dir ${st.getPath} (family $retired superseded)")
            fs.delete(st.getPath, true)
          }
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"GateIndex retired-family sweep for $scope failed " +
          s"(leftovers may persist until a later sweep succeeds)", e)
    }
  }

  /** Clear a gate-owned warehouse table AND its physical location: a fresh
    * session's catalog doesn't know tables an earlier JVM left in the
    * warehouse, so DROP alone leaves the directory and saveAsTable dies
    * with LOCATION_ALREADY_EXISTS. */
  def dropGateTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
  }
}
