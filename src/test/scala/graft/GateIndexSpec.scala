package graft

import graft.queries.GateIndex
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Content-stamped index keys: the build-once gates must rebuild when the
  * dataset at a path is REGENERATED (same path, new bytes), and must reuse
  * when nothing changed — a stale persisted index silently serving a
  * previous corpus generation is a correctness bug, not a perf bug. */
class GateIndexSpec extends AnyFunSuite {

  private def tmpDir(): java.nio.file.Path =
    Files.createTempDirectory("gateindex")

  test("TempDirs.release deletes a staged dir now; double release is a no-op") {
    val d = graft.queries.TempDirs.create("graft_tempdirs_spec")
    Files.write(Paths.get(d, "x.bin"), Array[Byte](1, 2))
    assert(Files.exists(Paths.get(d)))
    graft.queries.TempDirs.release(d)
    assert(!Files.exists(Paths.get(d)), "release must delete immediately")
    graft.queries.TempDirs.release(d) // unregistered: must not throw
  }

  test("dirKey is stable across calls when the directory is unchanged") {
    val d = tmpDir()
    Files.write(d.resolve("a.parquet"), Array[Byte](1, 2, 3))
    assert(GateIndex.dirKey(d.toString) == GateIndex.dirKey(d.toString))
  }

  test("dirKey changes when a file's content size changes") {
    val d = tmpDir()
    val f = d.resolve("a.parquet")
    Files.write(f, Array[Byte](1, 2, 3))
    val k1 = GateIndex.dirKey(d.toString)
    Files.write(f, Array[Byte](1, 2, 3, 4))
    assert(GateIndex.dirKey(d.toString) != k1)
  }

  test("dirKey changes when a file is added") {
    val d = tmpDir()
    Files.write(d.resolve("a.parquet"), Array[Byte](1))
    val k1 = GateIndex.dirKey(d.toString)
    Files.write(d.resolve("b.parquet"), Array[Byte](2))
    assert(GateIndex.dirKey(d.toString) != k1)
  }

  test("dirKey changes when mtime changes with identical bytes") {
    val d = tmpDir()
    val f = d.resolve("a.parquet")
    Files.write(f, Array[Byte](1, 2, 3))
    val k1 = GateIndex.dirKey(d.toString)
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(f).toMillis + 60000))
    assert(GateIndex.dirKey(d.toString) != k1)
  }

  test("dirKey distinguishes distinct paths and tolerates missing dirs") {
    val d1 = tmpDir(); val d2 = tmpDir()
    assert(GateIndex.dirKey(d1.toString) != GateIndex.dirKey(d2.toString))
    // nonexistent dir: still deterministic, no throw
    val ghost = Paths.get("/does/not/exist/graft")
    assert(GateIndex.dirKey(ghost.toString) == GateIndex.dirKey(ghost.toString))
  }

  test("dirKey is a valid table-name suffix (lowercase hex, no dashes)") {
    val d = tmpDir()
    Files.write(d.resolve("a.parquet"), Array[Byte](9, 9))
    assert(GateIndex.dirKey(d.toString).matches("[0-9a-f]+"))
  }

  test("gatePrefix garbage-collects superseded keys, keeps other dirs' indexes") {
    // Regenerating a dataset mints a new key; the old content-stamped
    // index tables (and their warehouse dirs) must be dropped, or the
    // warehouse grows by one index family per regeneration forever. The
    // GC must be scoped to (family, directory): the same family's index
    // for a DIFFERENT data directory is live state, not garbage.
    val spark = SparkSpec.session
    import spark.implicits._
    val d = tmpDir()
    Files.write(d.resolve("a.parquet"), Array[Byte](1, 2, 3))
    val fam = "graft_gc_spec_gate"
    val p1 = GateIndex.gatePrefix(spark, fam, d.toString)
    Seq((1L, "x")).toDF("id", "v").write.saveAsTable(p1)
    Seq((1L, "x")).toDF("id", "v").write.saveAsTable(s"${p1}_sets")
    // same family, DIFFERENT directory — must survive every GC below
    val d2 = tmpDir()
    Files.write(d2.resolve("a.parquet"), Array[Byte](9))
    val pOther = GateIndex.gatePrefix(spark, fam, d2.toString)
    Seq((1L, "x")).toDF("id", "v").write.saveAsTable(pOther)
    // regenerate: same path, new bytes -> new key; GC drops p1 (+suffixes)
    Files.write(d.resolve("a.parquet"), Array[Byte](1, 2, 3, 4))
    val p2 = GateIndex.gatePrefix(spark, fam, d.toString)
    assert(p2 != p1)
    assert(!spark.catalog.tableExists(p1), "stale key's table must be dropped")
    assert(!spark.catalog.tableExists(s"${p1}_sets"),
      "stale key's suffixed tables must be dropped too")
    assert(spark.catalog.tableExists(pOther),
      "same family for another directory is live, not garbage")
    // regenerate AGAIN so a fresh GC (new key, no memo hit) re-checks the
    // scoping live — guards against a regression widening the prefix filter
    Seq((2L, "y")).toDF("id", "v").write.saveAsTable(p2)
    Files.write(d.resolve("a.parquet"), Array[Byte](5, 6))
    val p3 = GateIndex.gatePrefix(spark, fam, d.toString)
    assert(p3 != p2 && !spark.catalog.tableExists(p2))
    assert(spark.catalog.tableExists(pOther),
      "GC scoping must hold on every fresh key, not just the first")
    GateIndex.dropGateTable(spark, pOther)
    GateIndex.dropGateTable(spark, p3)
  }

  test("gatePrefix GC never reaches name-coincident tables it didn't mint") {
    // ADVICE r13: the old legacy arm swept ANY `family_*` table, which
    // could destroy a user/other-application table that merely shares the
    // name prefix. The GC's reach is now exactly `family_p<64-bit path
    // key>_…` — everything else survives, INCLUDING pre-r14 32-bit-keyed
    // leftovers (the r15 opt-in migration arm is deleted in r16: its
    // window is over, and a 32-bit path key can collide across
    // directories, so such leftovers are the operator's to drop by
    // exact name).
    val spark = SparkSpec.session
    import spark.implicits._
    val d = tmpDir()
    Files.write(d.resolve("a.parquet"), Array[Byte](4, 2))
    val fam = "graft_gc_legacy_gate"
    def mk(n: String): Unit = {
      GateIndex.dropGateTable(spark, n) // clear strays from earlier JVMs
      Seq((1L, "x")).toDF("id", "v").write.saveAsTable(n)
    }
    mk(fam)                           // bare name: NOT ours to delete
    mk(s"${fam}_ffffffffcafe1234")    // content-only era name: untouched
    // pre-r14 32-bit path component for THIS directory: also untouched
    val legacy32 = java.lang.Long.toHexString(d.toString.hashCode.toLong & 0xffffffffL)
    mk(s"${fam}_p${legacy32}_deadbeef")
    val cur = GateIndex.gatePrefix(spark, fam, d.toString)
    assert(spark.catalog.tableExists(fam),
      "a bare name-coincident table must survive the GC")
    assert(spark.catalog.tableExists(s"${fam}_ffffffffcafe1234"),
      "a content-only-era name must survive the GC")
    assert(spark.catalog.tableExists(s"${fam}_p${legacy32}_deadbeef"),
      "a pre-r14 32-bit table must survive (the migration arm is retired)")
    // a superseded generation of the current format is of course swept
    Seq((1L, "x")).toDF("id", "v").write.saveAsTable(cur)
    Files.write(d.resolve("c.parquet"), Array[Byte](8))
    val cur3 = GateIndex.gatePrefix(spark, fam, d.toString)
    assert(cur3 != cur && !spark.catalog.tableExists(cur))
    GateIndex.dropGateTable(spark, cur3)
    GateIndex.dropGateTable(spark, fam)
    GateIndex.dropGateTable(spark, s"${fam}_ffffffffcafe1234")
    GateIndex.dropGateTable(spark, s"${fam}_p${legacy32}_deadbeef")
  }

  test("dropRetiredFamily sweeps exactly the renamed family's generations for this directory") {
    // ADVICE r15: renaming graft_pr_gate → graft_graph_gate orphaned the
    // old family's tables (the GC is family-scoped). The retirement drop
    // reaches exactly `retired_p<this dir's 64-bit key>_…` — not the
    // bare name, not another directory's generations, not the live
    // family.
    val spark = SparkSpec.session
    import spark.implicits._
    val d = tmpDir(); val dOther = tmpDir()
    Files.write(d.resolve("a.parquet"), Array[Byte](4, 2))
    val fam = "graft_retired_spec_gate"
    def mk(n: String): Unit = {
      GateIndex.dropGateTable(spark, n)
      Seq((1L, "x")).toDF("id", "v").write.saveAsTable(n)
    }
    val mine = GateIndex.gatePrefix(spark, fam, d.toString)
    val other = GateIndex.gatePrefix(spark, fam, dOther.toString)
    mk(mine); mk(other); mk(fam)
    GateIndex.dropRetiredFamily(spark, fam, d.toString)
    assert(!spark.catalog.tableExists(mine),
      "the retired family's generation for this directory must drop")
    assert(spark.catalog.tableExists(other),
      "another directory's generation must survive the retirement drop")
    assert(spark.catalog.tableExists(fam),
      "a bare name-coincident table must survive the retirement drop")
    // memoized: re-minting the same name is safe within this JVM run
    mk(mine)
    GateIndex.dropRetiredFamily(spark, fam, d.toString)
    assert(spark.catalog.tableExists(mine),
      "the retirement sweep runs once per (family, dir) per JVM")
    GateIndex.dropGateTable(spark, mine)
    GateIndex.dropGateTable(spark, other)
    GateIndex.dropGateTable(spark, fam)
  }
}
