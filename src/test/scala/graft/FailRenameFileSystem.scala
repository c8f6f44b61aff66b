package graft

import org.apache.hadoop.fs.Path

/** Test-only Hadoop FileSystem: the local filesystem under the
  * `failrename://` scheme, except that renaming a `*_stage` directory
  * returns false — the silent-failure mode Hadoop FileSystems report
  * for rename (no exception, just `false`). Used by DedupSpec to
  * prove `Dedup.signatureStoreVacuum`'s swap leaves the store
  * incomplete (marker dropped, rebuild forced) instead of publishing
  * a valid marker over a table that never moved. Parquet's committer
  * renames (task attempts out of `_temporary`) never have a source
  * basename ending in `_stage`, so normal writes are unaffected.
  */
class FailRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "failrename"
  override def getUri: java.net.URI = java.net.URI.create("failrename:///")
  override def rename(src: Path, dst: Path): Boolean =
    if (src.getName.endsWith("_stage")) false
    else super.rename(src, dst)
}
