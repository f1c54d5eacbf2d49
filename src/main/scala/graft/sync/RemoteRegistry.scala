package graft.sync

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.json4s.DefaultFormats
import org.json4s.jackson.Serialization

/**
 * Workspace-level registry of named remote repositories — the role of the
 * reference's `RemoteRepositoryRegistry`
 * (src/infra/core/src/services/remote/remote_repository_registry_impl.rs):
 * a name → URL map so CLI `push`/`pull` can say `origin` instead of a full
 * URI. Stored as a single JSON file under `<workspace>/.graft/remotes.json`
 * (dot-prefixed, so workspace dataset listings never mistake it for a
 * dataset directory). Any Hadoop-FS-resolvable URL is a valid remote.
 */
final class RemoteRegistry(workspace: Path, conf: Configuration) {
  private implicit val formats: DefaultFormats.type = DefaultFormats
  private val file = new Path(new Path(workspace, ".graft"), "remotes.json")
  private val fs = file.getFileSystem(conf)

  def list(): Map[String, String] =
    if (!fs.exists(file)) Map.empty
    else {
      val in = fs.open(file)
      val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
      Serialization.read[Map[String, String]](s)
    }

  def add(name: String, url: String): Unit = write(list() + (name -> url))

  def remove(name: String): Unit = write(list() - name)

  def resolve(nameOrUrl: String): String =
    list().getOrElse(nameOrUrl, nameOrUrl) // unknown alias → treat as a URL

  private def write(m: Map[String, String]): Unit = {
    fs.mkdirs(file.getParent)
    val out = fs.create(file, true)
    try out.write(Serialization.write(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
