package graft

/** Session-scoped scratch directories (advisor r11: n8/n9 allocated a
  * fresh `Files.createTempDirectory` per invocation and never deleted
  * it — a bench session runs each query ~9+ times, orphaning index
  * stores under /tmp).
  *
  * All scratch dirs live under ONE lazily-created session root that a
  * JVM shutdown hook deletes recursively, so repeated invocations
  * within a session accumulate only until exit and nothing survives
  * the process. Callers that need the files to outlive the returned
  * (lazy) DataFrame keep working unchanged — evaluation always happens
  * within the session.
  */
object TempDirs {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-session")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh scratch dir under the session root, removed at JVM exit. */
  def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(root, tag).toString

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try {
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      } finally stream.close()
    }
  }
}
