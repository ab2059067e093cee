package graft.core

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem with in-process permission handling.
  *
  * Without the native-hadoop library (this image never loads it —
  * `NativeCodeLoader: Unable to load native-hadoop library`), Hadoop's
  * `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand("chmod", ...)`: a fork+exec of /bin/chmod for EVERY
  * file create and every mkdir (`RawLocalFileSystem.java:1179`, Hadoop
  * 3.4.2). Forking a multi-GB JVM per staged parquet file is the single
  * largest fixed cost of every commit on this engine's write paths —
  * thread dumps of a hidden-partitioned INSERT showed the write task
  * spending its entire 2.8 s inside `ProcessImpl.forkAndExec` (~26 tuple
  * files × (create + .crc create + mkdir) ≈ 80 forks), and the same tax
  * rides every manifest publish, DV sidecar, streaming checkpoint and
  * parquet sink in the suite.
  *
  * These subclasses keep Hadoop's semantics — the permission IS applied,
  * checksums stay on — but set it with `java.nio.file.Files
  * .setPosixFilePermissions` (a single fchmodat syscall) instead of a
  * subprocess. This is exactly what the native-hadoop `NativeIO.POSIX
  * .chmod` path does on a production deployment; at 100 TB on HDFS/S3
  * this class is simply never instantiated, so nothing here is
  * local-mode tuning — it restores the production cost model (no
  * subprocess per file) that the missing native library broke.
  *
  * Registered by [[Sessions.builder]] via `fs.file.impl` (the
  * `FileSystem` API: all table staging, manifests, sinks) and
  * `fs.AbstractFileSystem.file.impl` (the `FileContext` API: structured
  * streaming's checkpoint manager).
  */
object NioLocalFileSystem {
  private[core] def applyNio(f: java.io.File, permission: FsPermission): Boolean = {
    import java.nio.file.attribute.PosixFilePermission._
    if (permission == null) return true
    val bits = permission.toShort
    val set = java.util.EnumSet.noneOf(classOf[java.nio.file.attribute.PosixFilePermission])
    if ((bits & 0x100) != 0) set.add(OWNER_READ)
    if ((bits & 0x080) != 0) set.add(OWNER_WRITE)
    if ((bits & 0x040) != 0) set.add(OWNER_EXECUTE)
    if ((bits & 0x020) != 0) set.add(GROUP_READ)
    if ((bits & 0x010) != 0) set.add(GROUP_WRITE)
    if ((bits & 0x008) != 0) set.add(GROUP_EXECUTE)
    if ((bits & 0x004) != 0) set.add(OTHERS_READ)
    if ((bits & 0x002) != 0) set.add(OTHERS_WRITE)
    if ((bits & 0x001) != 0) set.add(OTHERS_EXECUTE)
    try { java.nio.file.Files.setPosixFilePermissions(f.toPath, set); true }
    catch {
      // non-POSIX store: let the caller fall back to Hadoop's own path
      case _: UnsupportedOperationException => false
    }
  }
}

/** RawLocalFileSystem whose chmod is a syscall, not a subprocess. */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    if (!NioLocalFileSystem.applyNio(pathToFile(p), permission))
      super.setPermission(p, permission)
}

/** Drop-in `fs.file.impl`: LocalFileSystem (checksums and all) over the
  * nio raw layer.
  */
class NioLocalFileSystemImpl
  extends LocalFileSystem(new NioRawLocalFileSystem)

/** The `FileContext` twin (`fs.AbstractFileSystem.file.impl`) — mirrors
  * Hadoop's `LocalFs = ChecksumFs(RawLocalFs)` composition over the nio
  * raw layer.
  */
class NioLocalFs(uri: URI, conf: Configuration)
  extends ChecksumFs(new NioRawLocalFs(uri, conf))

class NioRawLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NioRawLocalFileSystem, conf,
    "file", false)
