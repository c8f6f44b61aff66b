package graft

import org.apache.hadoop.fs.Path

/** Test-only Hadoop FileSystem: the local filesystem under the
  * `faildelete://` scheme, except that deletes of consumer-checkpoint
  * marker files (`_version` / `_version.<N>`) return false — the
  * silent-failure mode Hadoop FileSystems report (no exception, just
  * `false`). Everything else (data writes, renames, other deletes)
  * behaves normally, so only the checkpoint CLEANUP leg is refused:
  * the spec proves a refused cleanup leaves a stale LOWER marker
  * behind that max-on-read ignores — the consumer position can never
  * be lost or regressed by a failed delete.
  */
class FailDeleteFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  private val Marker = "_version(\\.\\d+)?".r
  override def getScheme: String = "faildelete"
  override def getUri: java.net.URI = java.net.URI.create("faildelete:///")
  override def delete(p: Path, recursive: Boolean): Boolean =
    p.getName match {
      case Marker(_*) => false
      case _ => super.delete(p, recursive)
    }
}
