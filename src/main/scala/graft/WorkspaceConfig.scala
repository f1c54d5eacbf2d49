package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.json4s.DefaultFormats
import org.json4s.jackson.Serialization

/**
 * Workspace-scoped configuration — the role of the reference's CLI config
 * service (src/app/cli/src/commands/config_command.rs, `config get/set/list`
 * over scoped config files). One flat key → string map stored at
 * `<workspace>/.graft/config.json` beside the remote registry; the
 * reference's *user* scope (a home-directory file) is intentionally not
 * implemented — in a multi-tenant deployment the workspace IS the unit of
 * configuration.
 *
 * Keys are dotted paths (`compact.maxSliceRecords`, `serve.rest.port`);
 * consumers read through the typed accessors and fall back to their own
 * defaults, so an empty config is always valid.
 */
final class WorkspaceConfig(workspace: Path, conf: Configuration) {
  private implicit val formats: DefaultFormats.type = DefaultFormats
  private val file = new Path(new Path(workspace, ".graft"), "config.json")
  private val fs = file.getFileSystem(conf)

  def list(): Map[String, String] =
    if (!fs.exists(file)) Map.empty
    else {
      val in = fs.open(file)
      val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
      Serialization.read[Map[String, String]](s)
    }

  def get(key: String): Option[String] = list().get(key)

  def getLong(key: String): Option[Long] = get(key).map { v =>
    try v.toLong
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"config $key must be an integer, got '$v'")
    }
  }

  def getInt(key: String): Option[Int] = getLong(key).map(_.toInt)

  def set(key: String, value: String): Unit = write(list() + (key -> value))

  def unset(key: String): Unit = write(list() - key)

  private def write(m: Map[String, String]): Unit =
    graft.FsAtomic.write(fs, file,
      Serialization.write(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
