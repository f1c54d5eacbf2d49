package graft.adapter

import scala.annotation.tailrec

import graft.operators.Export
import graft.query.QueryService

/**
 * GraphQL data surface — the subset of the reference's GraphQL API that
 * serves data (src/adapter/graphql/src/queries/data.rs:26-91): dataset
 * discovery, schema, tail, and SQL query, e.g.
 *
 * {{{
 *   { datasets { name kind head } }
 *   { dataset(name: "cities") { name schema tail(limit: 5) query(sql: "SELECT ...", limit: 10) } }
 * }}}
 *
 * A real (small) recursive-descent parser over the GraphQL grammar subset:
 * selection sets, fields, (ident: string|number) arguments — enough for
 * every data query the reference's API answers, with standard
 * `{"data":…}` / `{"errors":[{"message":…}]}` envelopes.
 */
object GraphQL {

  final case class Field(name: String, args: Map[String, String], subs: List[Field])

  // ----------------------------------------------------------- tokenizer

  private sealed trait Tok
  private final case class TIdent(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TNum(s: String) extends Tok
  private final case class TPunct(c: Char) extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace || c == ',') i += 1
      else if ("{}():".contains(c)) { out += TPunct(c); i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < s.length && s(i) != '"') {
          if (s(i) == '\\' && i + 1 < s.length) {
            sb.append(s(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case other => other
            })
            i += 2
          } else { sb.append(s(i)); i += 1 }
        }
        require(i < s.length, "graphql: unterminated string")
        i += 1
        out += TStr(sb.toString)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TIdent(s.substring(start, i))
      } else if (c.isDigit || c == '-') {
        val start = i
        i += 1
        while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
        out += TNum(s.substring(start, i))
      } else throw new IllegalArgumentException(s"graphql: unexpected character '$c'")
    }
    out.result()
  }

  // -------------------------------------------------------------- parser

  private final class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    def expect(c: Char): Unit = next() match {
      case TPunct(`c`) => ()
      case other       => throw new IllegalArgumentException(s"graphql: expected '$c', got $other")
    }
  }

  /** Parse a document: optional `query [Name]` keyword, then a selection set. */
  def parse(doc: String): List[Field] = {
    val p = new P(tokenize(doc))
    p.peek match {
      case Some(TIdent("query")) =>
        p.next()
        p.peek match { case Some(TIdent(_)) => p.next(); case _ => () } // operation name
      case _ => ()
    }
    selectionSet(p)
  }

  private def selectionSet(p: P): List[Field] = {
    p.expect('{')
    val fields = List.newBuilder[Field]
    @tailrec def loop(): Unit = p.peek match {
      case Some(TPunct('}')) => p.next(); ()
      case Some(TIdent(_))   => fields += field(p); loop()
      case other             => throw new IllegalArgumentException(s"graphql: unexpected $other in selection set")
    }
    loop()
    fields.result()
  }

  private def field(p: P): Field = {
    val name = p.next() match {
      case TIdent(n) => n
      case other     => throw new IllegalArgumentException(s"graphql: expected field name, got $other")
    }
    val args = p.peek match {
      case Some(TPunct('(')) =>
        p.next()
        val m = Map.newBuilder[String, String]
        @tailrec def loop(): Unit = p.peek match {
          case Some(TPunct(')')) => p.next(); ()
          case Some(TIdent(k)) =>
            p.next(); p.expect(':')
            val v = p.next() match {
              case TStr(s)   => s
              case TNum(n)   => n
              case TIdent(b) => b // true/false/enum
              case other     => throw new IllegalArgumentException(s"graphql: bad argument value $other")
            }
            m += k -> v
            loop()
          case other => throw new IllegalArgumentException(s"graphql: unexpected $other in arguments")
        }
        loop()
        m.result()
      case _ => Map.empty[String, String]
    }
    val subs = p.peek match {
      case Some(TPunct('{')) => selectionSet(p)
      case _                 => Nil
    }
    Field(name, args, subs)
  }

  // ------------------------------------------------------------ executor

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** Execute a document against the query service; returns the response
    * body JSON (data or errors envelope). */
  def execute(
      qs: QueryService,
      datasets: Map[String, graft.dataset.Dataset],
      doc: String
  ): String =
    try {
      val fields = parse(doc)
      val rendered = fields.map(f => s"${jstr(f.name)}:${top(qs, datasets, f)}").mkString(",")
      s"""{"data":{$rendered}}"""
    } catch {
      case e: Exception =>
        s"""{"errors":[{"message":${jstr(Option(e.getMessage).getOrElse(e.getClass.getName))}}]}"""
    }

  private def top(
      qs: QueryService,
      datasets: Map[String, graft.dataset.Dataset],
      f: Field
  ): String = f.name match {
    case "datasets" =>
      qs.knownDatasets
        .map { n =>
          val subs = if (f.subs.nonEmpty) f.subs.map(_.name) else List("name")
          subs.map(s => s"${jstr(s)}:${metaField(qs, datasets, n, s)}").mkString("{", ",", "}")
        }
        .mkString("[", ",", "]")
    case "dataset" =>
      val name = f.args.getOrElse("name",
        throw new IllegalArgumentException("dataset(name:) argument required"))
      require(qs.knownDatasets.contains(name), s"unknown dataset '$name'")
      f.subs
        .map { sub =>
          val v = sub.name match {
            case "name" | "kind" | "head" | "schema" => metaField(qs, datasets, name, sub.name)
            case "tail" =>
              val n = sub.args.get("limit").map(_.toInt).getOrElse(10)
              Export.jsonAoS(qs.tail(name, n))
            case "state" => Export.jsonAoS(qs.state(name))
            case "lineage" =>
              // upstream dependency graph (provenance_service.rs:17; the
              // reference exposes lineage via GraphQL dataset metadata)
              val resolve = (n: String) => datasets.getOrElse(n,
                throw new IllegalArgumentException(s"lineage input '$n' unknown"))
              graft.transform.Lineage.nodes(datasets(name), resolve).map { nd =>
                s"""{"name":${jstr(nd.name)},"kind":${jstr(nd.kind)},"depth":${nd.depth},""" +
                  s""""head":${jstr(nd.headHash.getOrElse(""))},""" +
                  s""""inputs":${nd.inputs.map(jstr).mkString("[", ",", "]")}}"""
              }.mkString("[", ",", "]")
            case "query" =>
              val sql = sub.args.getOrElse("sql",
                throw new IllegalArgumentException("query(sql:) argument required"))
              val limit = sub.args.get("limit").map(_.toInt).getOrElse(100)
              val skip = sub.args.get("skip").map(_.toLong).getOrElse(0L)
              Export.jsonAoS(qs.page(qs.sql(sql), skip, limit))
            case other => throw new IllegalArgumentException(s"unknown field 'dataset.$other'")
          }
          s"${jstr(sub.name)}:$v"
        }
        .mkString("{", ",", "}")
    case "search" =>
      // src/adapter/graphql/src/queries/search.rs: case-insensitive
      // substring search, paged
      val q2 = f.args.getOrElse("query",
        throw new IllegalArgumentException("search(query:) argument required"))
      val limit = f.args.get("limit").map(_.toInt).getOrElse(15)
      graft.query.Search.search(datasets, q2, limit).map { h =>
        s"""{"dataset":${jstr(h.dataset)},"field":${jstr(h.field)},"snippet":${jstr(h.snippet)}}"""
      }.mkString("[", ",", "]")
    case other => throw new IllegalArgumentException(s"unknown root field '$other'")
  }

  private def metaField(
      qs: QueryService,
      datasets: Map[String, graft.dataset.Dataset],
      name: String,
      field: String
  ): String = field match {
    case "name"   => jstr(name)
    case "kind"   => jstr(datasets.get(name).map(_.kind).getOrElse("root"))
    case "head"   => jstr(datasets.get(name).flatMap(_.chain.head.map(_._2)).getOrElse(""))
    case "schema" => jstr(qs.schemaDdl(name).getOrElse(""))
    case other    => throw new IllegalArgumentException(s"unknown field 'datasets.$other'")
  }
}
