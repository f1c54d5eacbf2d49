package graft.query

import java.nio.file.Files

import graft.SparkSpec
import graft.dataset.Dataset
import graft.model.MetadataEvent.{Attachment, SetAttachments, SetDataSchema, SetInfo, SetLicense}

/** Workspace metadata search: name/kind/description/schema/license/
  * attachment matching, snippets, case-insensitivity, limit. */
class SearchSpec extends SparkSpec {

  private lazy val datasets = {
    val work = Files.createTempDirectory("graft-search-")
    val cities = Dataset.create(spark, work.resolve("cities"), "cities")
    cities.chain.append(SetInfo("Population of world cities, updated monthly"), 1L)
    cities.chain.append(SetDataSchema("city STRING, population INT"), 2L)
    cities.chain.append(SetLicense("ODC-BY", None), 3L)
    val trades = Dataset.create(spark, work.resolve("trades"), "trades", kind = "derivative")
    trades.chain.append(SetAttachments(Seq(
      Attachment("README.md", "Aggregated TRADE volumes by instrument"))), 1L)
    Map("cities" -> cities, "trades" -> trades)
  }

  test("matches names, descriptions, schema columns, licenses, attachments") {
    assert(Search.search(datasets, "citi").map(h => (h.dataset, h.field)) ===
      Seq(("cities", "name"), ("cities", "description"))) // "cities" appears in both
    assert(Search.search(datasets, "POPULATION").map(h => (h.dataset, h.field)) ===
      Seq(("cities", "description"), ("cities", "schema")))
    assert(Search.search(datasets, "odc").head.field === "license")
    val att = Search.search(datasets, "trade volumes")
    assert(att === Seq(Search.Hit("trades", "attachment",
      "README.md: Aggregated TRADE volumes by instrument")))
    assert(Search.search(datasets, "derivative").map(_.field) === Seq("kind"))
    assert(Search.search(datasets, "nonexistent-zzz") === Nil)
  }

  test("snippet windows long text around the match") {
    val work = Files.createTempDirectory("graft-search2-")
    val ds = Dataset.create(spark, work.resolve("long"), "long")
    ds.chain.append(SetInfo(("x" * 100) + " NEEDLE " + ("y" * 100)), 1L)
    val hit = Search.search(Map("long" -> ds), "needle").head
    assert(hit.snippet.contains("NEEDLE") && hit.snippet.length < 80)
    assert(hit.snippet.startsWith("…") && hit.snippet.endsWith("…"))
  }

  test("limit caps the result list") {
    assert(Search.search(datasets, "e", limit = 2).size === 2)
  }

  test("rank orders datasets by hashed-TF cosine relevance") {
    val r = Search.rank(datasets, "city population data")
    assert(r.nonEmpty && r.head.dataset === "cities", r.toString)
    assert(r.forall(x => x.score > 0 && x.score <= 1.0))
    // a query about trading should rank trades first (name + attachment-free
    // text still carries 'trades' from the dataset name)
    val t = Search.rank(datasets, "trades volumes")
    assert(t.nonEmpty && t.head.dataset === "trades", t.toString)
    // gibberish matches nothing
    assert(Search.rank(datasets, "zzzxqwv") === Nil)
    // deterministic
    assert(Search.rank(datasets, "city population data") === r)
  }
}
