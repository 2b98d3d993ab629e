package graft

import java.nio.file.{Files, Path}

/** JVM-lifetime temp directories with RECURSIVE cleanup at shutdown.
  * `File.deleteOnExit` only removes EMPTY directories, so a parquet
  * memo registered that way leaks its whole snapshot into the system
  * temp dir on every run — this registers one shutdown hook that
  * walks each registered tree deepest-first. (On a cluster the memos
  * would live under Spark's scratch dir and ride executor cleanup;
  * these are driver-local eval-harness artifacts.)
  */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach { root =>
        try {
          if (Files.exists(root)) {
            Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder[Path]())
              .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
          }
        } catch { case _: Exception => () }
      }
    }, "graft-tempdir-cleanup"))
  }

  /** Create a temp directory removed (recursively) at JVM exit. */
  def create(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }
}
