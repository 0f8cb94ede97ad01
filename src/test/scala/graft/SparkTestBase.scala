package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the
  * suite fast; `getOrCreate` reuses it across suites in the forked test
  * JVM). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  def sqlc = spark.sqlContext

  /** Fresh temp dir, deleted at JVM exit — specs must not accrete /tmp
    * litter across test runs (one hook drains a queue; never a hook per
    * call). */
  def tempDir(prefix: String): String = SparkTestBase.tempDir(prefix)
}

object SparkTestBase {
  lazy val session: SparkSession = GraftSession.local(4, "graft-test")

  private val dirsToClean =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = dirsToClean.poll()
      while (p != null) {
        try graft.Fs.deleteRecursively(p) catch { case _: Throwable => () }
        p = dirsToClean.poll()
      }
    }))

  def tempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    hookInstalled
    dirsToClean.add(d)
    d.toString
  }
}
