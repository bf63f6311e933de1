package graft.queries

/** Temp directories for gates that stage data on local disk (document
  * roundtrips, streaming fixtures): registered for recursive deletion at
  * JVM exit, because gate results are LAZY frames over the staged files —
  * the data must outlive the gate call (Verify writes the frame after the
  * gate returns) but must not outlive the process. Without this, every
  * bench/verify invocation strands corpus-sized parquet copies under /tmp
  * until the disk fills. */
object TempDirs {

  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p.toString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(p)) {
        _.iterator().asScala.toSeq.reverse
          .foreach(f => try java.nio.file.Files.delete(f)
            catch { case scala.util.control.NonFatal(_) => () })
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
