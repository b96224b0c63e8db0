package graft

import java.nio.file.{Files, Path}

/** Temp-dir factory with JVM-exit cleanup — Bench/Verify create staging
  * dirs (CSV/JSON exports, stream staging, checkpoints) per run; without
  * cleanup repeated runs leak disk until /tmp fills.
  */
object TempDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try deleteRecursively(p.toFile) catch { case _: Throwable => () }
    }
  }))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Create a temp directory removed at JVM exit. */
  def scoped(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    created.add(d)
    d.toString
  }
}
