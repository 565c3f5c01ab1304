package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Shared filesystem helpers for specs that write real artifacts
  * (ShardWriteSpec, CurationBoundarySpec): directory listings with the
  * stream actually closed (Files.list leaks a directory handle per call
  * otherwise) and recursive cleanup. */
object TestFs {
  def listDir(p: Path): Seq[Path] =
    Using.resource(Files.list(p))(_.iterator().asScala.toSeq)

  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
    ()
  }
}
