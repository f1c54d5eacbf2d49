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

  /**
   * Resolve a possibly multi-tenant remote ref to (base URL, remote dataset
   * path) — the reference's `DatasetRefRemote` grammar
   * (src/odf/metadata/src/identity/dataset_refs.rs, rendered
   * `repo/account/dataset` with the account optional,
   * dataset_alias.rs `DatasetAliasRemote`):
   *
   *   - `origin`                    → (url(origin), defaultDataset)
   *   - `origin/cities`             → (url(origin), "cities")
   *   - `origin/alice/cities`      → (url(origin), "alice/cities")
   *   - a URL (has "://")           → (URL, defaultDataset)
   *
   * The remote path nests under the repository root (an account is a
   * directory level — works identically on any Hadoop FS and on the HTTP
   * routes, which accept `/datasets/{account}/{name}/…`). Segments are
   * validated against traversal.
   */
  def resolveRef(ref: String, defaultDataset: String): (String, String) = {
    if (ref.contains("://")) return (ref, defaultDataset)
    ref.split("/", -1).toSeq match {
      case Seq(repo) => (resolve(repo), defaultDataset)
      case repo +: rest if rest.nonEmpty && rest.length <= 2 =>
        require(rest.forall(RemoteRegistry.safeSegment),
          s"invalid dataset ref segment in '$ref'")
        val url = list().getOrElse(repo,
          throw new IllegalArgumentException(
            s"'$repo' is not a known repository (of ref '$ref'); `repo add` it first"))
        (url, rest.mkString("/"))
      case _ => throw new IllegalArgumentException(
        s"remote ref '$ref' has too many segments (repo[/account]/dataset)")
    }
  }

  private def write(m: Map[String, String]): Unit =
    graft.FsAtomic.write(fs, file,
      Serialization.write(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  // ---------------------------------------------- per-dataset remote aliases

  import RemoteRegistry.DatasetAlias

  private val aliasFile = new Path(new Path(workspace, ".graft"), "aliases.json")

  /**
   * Per-dataset default remotes — the reference's `RemoteAliases`
   * (`kamu repo alias add/delete/list`): `push <ds>` / `pull <ds> --from`
   * with no remote argument resolve through these. A dataset may have many
   * aliases per kind; the no-argument forms require exactly one.
   */
  def aliases(): Seq[DatasetAlias] =
    if (!fs.exists(aliasFile)) Nil
    else {
      val in = fs.open(aliasFile)
      val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
      Serialization.read[Seq[DatasetAlias]](s)
    }

  def aliasAdd(dataset: String, kind: String, remote: String): Unit = {
    require(kind == "push" || kind == "pull", s"alias kind must be push|pull, got $kind")
    val a = DatasetAlias(dataset, kind, remote)
    if (!aliases().contains(a)) writeAliases(aliases() :+ a)
  }

  def aliasRemove(dataset: String, kind: Option[String], remote: Option[String]): Unit =
    writeAliases(aliases().filterNot(a =>
      a.dataset == dataset && kind.forall(_ == a.kind) && remote.forall(_ == a.remote)))

  /** The single `kind` alias for `dataset`; error when absent or ambiguous. */
  def aliasResolve(dataset: String, kind: String): String = {
    val hits = aliases().filter(a => a.dataset == dataset && a.kind == kind)
    hits match {
      case Seq(one) => one.remote
      case Seq() => throw new IllegalArgumentException(
        s"no $kind alias for $dataset; name the remote or `alias add $dataset <remote> --$kind`")
      case many => throw new IllegalArgumentException(
        s"$dataset has ${many.size} $kind aliases (${many.map(_.remote).mkString(", ")}); name one")
    }
  }

  private def writeAliases(as: Seq[DatasetAlias]): Unit =
    graft.FsAtomic.write(fs, aliasFile,
      Serialization.write(as).getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

object RemoteRegistry {
  /** `kind` is "push" or "pull" (RemoteAliasKind,
    * src/domain/core/src/services/remote/remote_aliases.rs). */
  final case class DatasetAlias(dataset: String, kind: String, remote: String)

  /** One account/dataset path segment: non-empty, no traversal, no
    * separator or control characters. */
  def safeSegment(s: String): Boolean =
    s.nonEmpty && s != "." && s != ".." &&
      s.forall(c => c > ' ' && c != '/' && c != '\\' && c != ':')
}
