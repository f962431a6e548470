package graft.tools

/** Best-effort recursive temp-dir cleanup for specs (the main-tree
  * queries carry their own reaper in RelationalQueries). */
object TestCleanup {
  def deleteRecursively(dir: java.nio.file.Path): Unit =
    try {
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => try java.nio.file.Files.deleteIfExists(p)
                      catch { case _: Exception => () })
      finally walk.close()
    } catch { case _: Exception => () }
}
