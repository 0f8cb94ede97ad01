package graft

import java.nio.file.{Files, Path}

/** Minimal filesystem helpers for the temp artifacts the engine's local
  * harnesses create (stream-dedup input/checkpoint dirs, per-run
  * warehouse dirs). */
object Fs {

  /** Best-effort recursive delete. The `Files.walk` stream is closed
    * explicitly — abandoning it leaks directory handles until GC in a
    * long-lived driver JVM. */
  def deleteRecursively(root: Path): Unit = {
    val s = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
    } finally s.close()
  }
}
