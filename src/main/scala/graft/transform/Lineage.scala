package graft.transform

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dataset.Dataset

/**
 * Provenance / lineage over the dependency graph a workspace's
 * `SetTransform` declarations induce — the reference's `ProvenanceService` +
 * `LineageVisitor` (src/domain/core/src/services/provenance_service.rs:17,
 * surfaced as `kamu inspect lineage`). The walk is the same depth-assigning
 * traversal [[TransformService.pullPlan]] uses (roots = 0, derivative =
 * 1 + max(inputs)), but keeps the EDGES, each node's kind, and its current
 * head block hash, so the graph itself is queryable.
 */
object Lineage {

  /** One dataset in the upstream lineage of a target. */
  final case class Node(
      name: String,
      kind: String,
      depth: Int,
      headHash: Option[String],
      inputs: Seq[String]
  )

  /** All datasets reachable upstream of `target` (target included), in
    * dependency order (inputs before dependents; ties by name). Throws on a
    * dependency cycle, like the pull planner. */
  def nodes(target: Dataset, resolve: String => Dataset): Seq[Node] = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Node]
    def visit(ds: Dataset, visiting: List[String]): Int = {
      val name = ds.name
      if (visiting.contains(name))
        throw new IllegalStateException(
          s"dependency cycle: ${(name :: visiting).reverse.mkString(" -> ")}")
      acc.get(name) match {
        case Some(n) => n.depth
        case None =>
          val inputs = ds.chain.transform().map(_.inputs).getOrElse(Nil)
          val depth =
            if (inputs.isEmpty) 0
            else 1 + inputs.map(n => visit(resolve(n), name :: visiting)).max
          acc(name) = Node(name, ds.kind, depth, ds.chain.head.map(_._2), inputs)
          depth
      }
    }
    visit(target, Nil)
    acc.values.toSeq.sortBy(n => (n.depth, n.name))
  }

  /** (dataset, input) edges of the lineage — empty for a pure root. */
  def edges(target: Dataset, resolve: String => Dataset): Seq[(String, String)] =
    nodes(target, resolve).flatMap(n => n.inputs.map(n.name -> _))

  /** The lineage as a DataFrame: one row per edge plus one `input = NULL`
    * row per root, so every dataset appears. Deterministic order. */
  def toDF(spark: SparkSession, target: Dataset, resolve: String => Dataset): DataFrame = {
    import spark.implicits._
    val rows = nodes(target, resolve).flatMap { n =>
      if (n.inputs.isEmpty) Seq((n.name, n.kind, n.depth, Option.empty[String]))
      else n.inputs.map(i => (n.name, n.kind, n.depth, Some(i)))
    }
    rows.toDF("dataset", "kind", "depth", "input").orderBy("depth", "dataset", "input")
  }

  /** Indented downstream→upstream tree for the CLI (`kamu inspect lineage`
    * default output shape). */
  def render(target: Dataset, resolve: String => Dataset): String = {
    val byName = nodes(target, resolve).map(n => n.name -> n).toMap
    val sb = new StringBuilder
    def walk(name: String, prefix: String, isLast: Boolean, isRoot: Boolean): Unit = {
      val n = byName(name)
      if (isRoot) sb.append(s"${n.name} (${n.kind})\n")
      else {
        val branch = if (isLast) "└── " else "├── "
        sb.append(prefix + branch + s"${n.name} (${n.kind})\n")
      }
      val childPrefix = if (isRoot) "" else prefix + (if (isLast) "    " else "│   ")
      n.inputs.zipWithIndex.foreach { case (in, i) =>
        walk(in, childPrefix, i == n.inputs.size - 1, isRoot = false)
      }
    }
    walk(target.name, "", isLast = true, isRoot = true)
    sb.result()
  }

  /** The lineage as Graphviz DOT (`kamu system depgraph`; the writer lives
    * in provenance_service_impl.rs:162-190 — `digraph datasets`,
    * `rankdir = LR`, styled node per dataset, one edge per declared input).
    * Deterministic order. */
  def toDot(target: Dataset, resolve: String => Dataset): String = {
    val ns = nodes(target, resolve)
    val sb = new StringBuilder("digraph datasets {\n")
    sb.append("rankdir = LR;\n")
    ns.sortBy(_.name).foreach { n =>
      val shape = if (n.kind == "derivative") "ellipse" else "box"
      sb.append(s""""${n.name}" [shape=$shape];\n""")
    }
    ns.flatMap(n => n.inputs.sorted.map(i => i -> n.name)).sorted.foreach {
      case (from, to) => sb.append(s""""$from" -> "$to";\n""")
    }
    sb.append("}\n")
    sb.result()
  }
}
