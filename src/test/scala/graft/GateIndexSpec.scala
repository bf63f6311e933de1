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
}
