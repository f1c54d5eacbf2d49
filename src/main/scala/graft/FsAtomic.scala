package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Whole-file atomic replace over the Hadoop FileSystem API: write to a
 * UUID temp name, then rename into place. Concurrent CLI processes (two
 * `flow run` ticks, a webhook delivery racing a subscription edit) get
 * last-writer-wins on WHOLE files — a reader can never observe a
 * truncated registry/config JSON. The same discipline the chain uses for
 * its head ref and content-addressed objects, factored out for the
 * workspace-level JSON registries.
 */
object FsAtomic {
  def write(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit = {
    fs.mkdirs(target.getParent)
    val tmp = new Path(target.getParent,
      s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes)
    finally out.close()
    // FileContext rename with OVERWRITE is a single atomic replace — no
    // delete-then-rename window where a reader finds the target absent
    // (the same primitive the chain's setHead uses). Schemes without an
    // AbstractFileSystem binding (e.g. test-only mock FSes) fall back to
    // delete + rename: still whole-file, just with an absent-target window.
    val fc =
      try Some(org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf))
      catch { case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None }
    fc match {
      case Some(ctx) =>
        try ctx.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        catch {
          case e: Exception =>
            fs.delete(tmp, false)
            throw new java.io.IOException(s"atomic replace of $target failed", e)
        }
      case None =>
        fs.delete(target, false)
        if (!fs.rename(tmp, target)) {
          fs.delete(tmp, false)
          throw new java.io.IOException(s"atomic replace of $target failed")
        }
    }
  }
}
