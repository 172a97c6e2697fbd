package graft.operators

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Inode probe for the copy-free rotation specs: maps every data file
  * under a directory (relative path → inode). Two directories sharing
  * a relative path with the same inode hold the SAME bytes without any
  * copy — the proof that rotation hardlinked instead of rewriting.
  */
object HardlinkProbe {

  private def ino(p: Path): Long =
    Files.getAttribute(p, "unix:ino").asInstanceOf[Long]

  def dataFiles(dir: String): Map[String, Long] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Map.empty
    else {
      val s = Files.walk(d)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filter { p =>
          val n = p.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".")
        }
        .map(p => d.relativize(p).toString -> ino(p)).toMap
      finally s.close()
    }
  }
}
