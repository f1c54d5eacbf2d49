package graft.transform

import java.nio.file.Files

import graft.SparkSpec
import graft.dataset.Dataset
import graft.model.MetadataEvent.SqlStep

/** Lineage walk over SetTransform declarations: nodes/edges/depths, tree
  * rendering, and cycle detection (provenance_service.rs:17). */
class LineageSpec extends SparkSpec {

  private def graph() = {
    val work = Files.createTempDirectory("graft-lineage-spec-")
    val a = Dataset.create(spark, work.resolve("a"), "a")
    val b = Dataset.create(spark, work.resolve("b"), "b")
    val mid = Dataset.create(spark, work.resolve("mid"), "mid", kind = "derivative")
    TransformService.setTransform(mid, Seq("a"), Seq(SqlStep(None, "SELECT * FROM a")), 0L)
    val leaf = Dataset.create(spark, work.resolve("leaf"), "leaf", kind = "derivative")
    TransformService.setTransform(leaf, Seq("mid", "b"),
      Seq(SqlStep(None, "SELECT * FROM mid")), 0L)
    val all = Map("a" -> a, "b" -> b, "mid" -> mid, "leaf" -> leaf)
    (all("leaf"), (n: String) => all(n))
  }

  test("nodes carry kind, depth, head hash, and inputs in dependency order") {
    val (leaf, resolve) = graph()
    val ns = Lineage.nodes(leaf, resolve)
    assert(ns.map(_.name) === Seq("a", "b", "mid", "leaf"))
    assert(ns.map(_.depth) === Seq(0, 0, 1, 2))
    assert(ns.find(_.name == "leaf").get.inputs === Seq("mid", "b"))
    assert(ns.forall(_.headHash.isDefined)) // every chain has at least its Seed
    assert(Lineage.edges(leaf, resolve) ===
      Seq("mid" -> "a", "leaf" -> "mid", "leaf" -> "b"))
  }

  test("render draws the downstream→upstream tree") {
    val (leaf, resolve) = graph()
    val tree = Lineage.render(leaf, resolve)
    assert(tree ===
      """leaf (derivative)
        |├── mid (derivative)
        |│   └── a (root)
        |└── b (root)
        |""".stripMargin, tree)
  }

  test("a dependency cycle is reported, not an infinite loop") {
    val work = Files.createTempDirectory("graft-lineage-cycle-")
    val x = Dataset.create(spark, work.resolve("x"), "x", kind = "derivative")
    TransformService.setTransform(x, Seq("y"), Seq(SqlStep(None, "SELECT 1")), 0L)
    val y = Dataset.create(spark, work.resolve("y"), "y", kind = "derivative")
    TransformService.setTransform(y, Seq("x"), Seq(SqlStep(None, "SELECT 1")), 0L)
    val all = Map("x" -> x, "y" -> y)
    val e = intercept[IllegalStateException](Lineage.nodes(x, all(_)))
    assert(e.getMessage.contains("cycle"))
  }
}
