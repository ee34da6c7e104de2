package graft

import java.net.URI
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Test-only Hadoop FileSystem registered for the `s3a` scheme (via `fs.s3a.impl`).
  *
  * The sandbox has no hadoop-aws jar and no egress, so a live S3AFileSystem cannot
  * load. From Spark's side, though, an object store IS just a `FileSystem` resolved
  * by scheme from `hadoopConfiguration` — which is exactly the contract under test:
  * URI routing, credential/conf plumbing, output-committer interplay, and the
  * reader/writer stack all run unmodified; only the byte transport is local disk.
  * (`s3a://test-bucket/<abs-path>` maps to `<abs-path>` — RawLocalFileSystem ignores
  * the authority.)
  */
class FakeS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: URI = URI.create("s3a://test-bucket")

  // RawLocalFileSystem's DeprecatedRawLocalFileStatus loads permissions lazily via
  // `new java.io.File(status.getPath.toUri)`, which rejects non-file schemes. Return
  // plain FileStatus objects (null permission -> scheme-independent defaults) so no
  // downstream consumer re-derives a local File from the s3a URI.
  private def sanitize(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, null, null, null, s.getPath)

  override def getFileStatus(f: Path): FileStatus = sanitize(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(sanitize)
}
