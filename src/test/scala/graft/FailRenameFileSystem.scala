package graft

import org.apache.hadoop.fs.Path

/** Test-only Hadoop FileSystem: the local filesystem under the
  * `failrename://` scheme, except that SWAP renames return false —
  * the silent-failure mode Hadoop FileSystems report for rename (no
  * exception, just `false`). Two swap shapes are refused: a `*_stage`
  * directory moving whole (the signature-store vacuum, DedupSpec),
  * and a `cluster_id=*` partition directory moving OUT of a
  * `*_stage` parent (the IVFADC vacuum's per-cluster swap,
  * IvfIndexSpec). Parquet's committer renames (task attempts out of
  * `_temporary`, then partition-dir merges whose source parent is
  * the task dir, not a stage dir) match neither shape, so the staging
  * writes inside both vacuums still succeed; only the final swap
  * fails — proving each vacuum leaves its store incomplete (marker
  * dropped, rebuild forced) instead of publishing a valid marker
  * over a table that never moved.
  */
class FailRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "failrename"
  override def getUri: java.net.URI = java.net.URI.create("failrename:///")
  override def rename(src: Path, dst: Path): Boolean =
    if (src.getName.endsWith("_stage")) false
    else if (src.getName.startsWith("cluster_id=") &&
      Option(src.getParent).exists(_.getName.endsWith("_stage"))) false
    // the VersionedTable commit point (manifest tmp -> final)
    else if (src.getName.endsWith(".manifest.tmp")) false
    else super.rename(src, dst)
}
