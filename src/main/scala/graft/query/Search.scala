package graft.query

import graft.dataset.Dataset
import graft.model.MetadataBlock
import graft.model.MetadataEvent.{SetInfo, SetLicense}

/**
 * Dataset search over a workspace — the role of the reference's search
 * surface (src/domain/search/, src/adapter/graphql/src/queries/search.rs:
 * case-insensitive substring over dataset aliases, surfaced as CLI
 * `kamu search` and GraphQL `search.query`). Extended here over the
 * metadata a workspace actually carries: name, kind, SetInfo description,
 * schema column names, license name, and attachment names/content.
 *
 * Scale note: this searches CHAIN METADATA (tiny, driver-side), not data —
 * a workspace with thousands of datasets is a thousands-of-chains walk, not
 * a Spark job. Content search over rows is what `QueryService.sql` is for;
 * semantic search over descriptions reuses the embedding operators (see
 * `Similarity.bruteForceTopK`).
 */
object Search {

  /** One match: which dataset, which metadata field hit, and the matching
    * text (trimmed to a short snippet). */
  final case class Hit(dataset: String, field: String, snippet: String)

  def search(datasets: Map[String, Dataset], query: String, limit: Int = 100): Seq[Hit] = {
    val q = query.toLowerCase(java.util.Locale.ROOT)
    def snip(s: String): String = {
      val i = math.max(0, s.toLowerCase(java.util.Locale.ROOT).indexOf(q))
      val from = math.max(0, i - 20)
      val to = math.min(s.length, i + q.length + 40)
      (if (from > 0) "…" else "") + s.substring(from, to).replace('\n', ' ') +
        (if (to < s.length) "…" else "")
    }

    substringHits(datasets, q, snip).take(limit).toSeq
  }

  private def substringHits(
      datasets: Map[String, Dataset],
      q: String,
      snip: String => String
  ): Iterator[Hit] = {
    def m(s: String): Boolean = s.toLowerCase(java.util.Locale.ROOT).contains(q)
    datasets.toSeq.sortBy(_._1).iterator.flatMap { case (name, ds) =>
      val blocks = ds.chain.blocks()
      val hits = Seq.newBuilder[Hit]
      if (m(name)) hits += Hit(name, "name", name)
      if (m(ds.kind)) hits += Hit(name, "kind", ds.kind)
      // latest declarations win, like every other chain visitor
      blocks.reverseIterator.collectFirst { case MetadataBlock(_, _, _, i: SetInfo) => i }
        .filter(i => m(i.description))
        .foreach(i => hits += Hit(name, "description", snip(i.description)))
      blocks.reverseIterator.collectFirst { case MetadataBlock(_, _, _, l: SetLicense) => l }
        .filter(l => m(l.name))
        .foreach(l => hits += Hit(name, "license", l.name))
      ds.chain.schemaDdl().filter(m).foreach { ddl =>
        // report the matching column, not the whole DDL
        val col = ddl.split(",").map(_.trim).find(m).getOrElse(ddl)
        hits += Hit(name, "schema", snip(col))
      }
      ds.chain.attachments().filter(a => m(a.name) || m(a.content)).foreach { a =>
        hits += Hit(name, "attachment",
          if (m(a.name)) a.name else s"${a.name}: ${snip(a.content)}")
      }
      hits.result()
    }
  }

  /**
   * Ranked free-text search over dataset descriptions — the role the newer
   * reference fills with semantic search (src/domain/search/): rank datasets
   * by cosine similarity between hashed term-frequency vectors of the query
   * and of each dataset's searchable text (name + description + schema).
   * The hashing vectorizer (feature hashing / "hashing trick") needs no
   * model or vocabulary, so it is fully deterministic; a real embedding
   * model would slot in by replacing [[tfVector]] and reusing the same
   * cosine ranking (at corpus scale that path is
   * `Similarity.bruteForceTopK` over a vectorized table).
   */
  final case class Ranked(dataset: String, score: Double)

  def rank(datasets: Map[String, Dataset], query: String, k: Int = 10): Seq[Ranked] = {
    val qv = tfVector(query)
    datasets.toSeq
      .map { case (name, ds) =>
        val text = (Seq(name) ++
          ds.chain.blocks().reverseIterator.collectFirst {
            case MetadataBlock(_, _, _, i: SetInfo) => i.description
          } ++
          ds.chain.schemaDdl()).mkString(" ")
        Ranked(name, cosine(qv, tfVector(text)))
      }
      .filter(_.score > 0)
      .sortBy(r => (-r.score, r.dataset))
      .take(k)
  }

  /** Hashed term-frequency vector (dimension [[TfDim]], md5-bucketed). */
  private[query] def tfVector(text: String): Array[Double] = {
    val v = new Array[Double](TfDim)
    text.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty).foreach { t =>
      val h = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      val bucket = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % TfDim
      v(bucket) += 1.0
    }
    v
  }
  private val TfDim = 512

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
}
