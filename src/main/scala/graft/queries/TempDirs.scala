package graft.queries

/** Temp directories for gates that stage data on local disk (document
  * roundtrips, streaming fixtures): registered for recursive deletion at
  * JVM exit, because gate results are LAZY frames over the staged files —
  * the data must outlive the gate call (Verify writes the frame after the
  * gate returns) but must not outlive the process. Without this, every
  * bench/verify invocation strands corpus-sized parquet copies under /tmp
  * until the disk fills.
  *
  * ONE static shutdown hook over a concurrent path registry (ADVICE r13:
  * a hook per create() grew an unbounded unremovable hook set in
  * long-lived sessions), plus [[release]] for callers that know the
  * staged data is consumed — the bench's repeated roundtrip gates can
  * then return the disk mid-process instead of at exit. */
object TempDirs {

  private val registry =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  // registered once, on first use; deletes whatever is still registered
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registry.forEach(p => deleteRecursively(p))
    registry.clear()
  }))

  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registry.add(p)
    p.toString
  }

  /** A temp dir for EPHEMERAL-BY-DESIGN state (bounded-replay stream
    * checkpoints: offset/commit logs + state-store deltas are dozens of
    * small fsync'd files per run), rooted on tmpfs when the platform has
    * one — the files never need to survive the process (the whole dir is
    * exit-deleted either way), so disk durability buys nothing and costs
    * an fsync per file. Production streams pass their own durable
    * checkpoint path; this is only for gates that replay a staged file. */
  def createEphemeral(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) {
      val p = java.nio.file.Files.createTempDirectory(shm, prefix)
      registry.add(p)
      p.toString
    } else create(prefix)
  }

  /** Delete a staged directory NOW and drop it from the exit registry —
    * call only when every lazy frame over the staged files is consumed. */
  def release(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (registry.remove(p)) deleteRecursively(p)
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
