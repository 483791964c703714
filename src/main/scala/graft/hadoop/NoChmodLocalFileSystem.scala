package graft.hadoop

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/**
 * Local-mode performance workaround: without libhadoop native IO, Hadoop's
 * RawLocalFileSystem shells out `chmod` (fork+exec of the whole JVM) on
 * EVERY file create — with a large heap this serializes all writers behind
 * process spawning. Permissions are meaningless for bench/test output, so
 * no-op them. Wire with:
 *   spark.hadoop.fs.file.impl = graft.hadoop.NoChmodLocalFileSystem
 * Cluster deployments (HDFS/S3 + committers) never hit this path.
 */
class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

class NoChmodLocalFileSystem extends LocalFileSystem(new NoChmodRawLocalFileSystem)
