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
    fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"atomic replace of $target failed")
    }
  }
}
