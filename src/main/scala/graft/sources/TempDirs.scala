package graft.sources

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** Recursive delete-on-exit for scratch directories. `File.deleteOnExit`
  * only removes EMPTY directories, so the table copies the round-trip
  * queries write (JSONL/CSV/ORC, foreachBatch batches) would accumulate
  * in /tmp across bench runs; one shutdown hook reclaims them all. */
object TempDirs {
  private val registered = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    registered.forEach { root =>
      try {
        Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      } catch { case _: Exception => () }
    }))

  def deleteOnExit(p: Path): Unit = registered.add(p)
}
