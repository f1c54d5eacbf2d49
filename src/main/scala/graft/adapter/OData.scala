package graft.adapter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.query.QueryService

/**
 * OData v4 read surface over datasets — the reference's OData adapter role
 * (src/adapter/odata/src/context.rs:71-162), which exists so spreadsheet /
 * BI tools can browse datasets without SQL:
 *
 *   GET /odata                         service document (entity sets)
 *   GET /odata/$metadata               EDMX CSDL schema
 *   GET /odata/{dataset}?$top&$skip&$select&$orderby&$filter
 *
 * The `$filter` dialect is the documented comparison subset: `col op literal`
 * with `eq ne gt ge lt le`, chained by `and`/`or` (no parentheses). Columns
 * are validated against the dataset schema and literals must match the
 * string/number/bool/null token grammar, so nothing user-controlled is ever
 * spliced into SQL unvalidated.
 */
object OData {

  private val CmpRe =
    """^([A-Za-z_][A-Za-z0-9_]*)\s+(eq|ne|gt|ge|lt|le)\s+('(?:[^']|'')*'|-?[0-9]+(?:\.[0-9]+)?|true|false|null)\s*""".r
  private val ConnRe = """^(and|or)\s+""".r

  private val ops =
    Map("eq" -> "=", "ne" -> "<>", "gt" -> ">", "ge" -> ">=", "lt" -> "<", "le" -> "<=")

  /** Translate the $filter subset to a SQL predicate; throws on anything
    * outside the grammar or on unknown columns. */
  def filterToSql(filter: String, columns: Set[String]): String = {
    val out = new StringBuilder
    var rest = filter.trim
    var first = true
    while (rest.nonEmpty) {
      if (!first) {
        val conn = ConnRe
          .findFirstMatchIn(rest)
          .getOrElse(throw new IllegalArgumentException(
            s"odata $$filter: expected 'and'/'or' at: $rest"))
        out.append(' ').append(conn.group(1).toUpperCase).append(' ')
        rest = rest.drop(conn.matched.length)
      }
      val m = CmpRe
        .findFirstMatchIn(rest)
        .getOrElse(throw new IllegalArgumentException(s"odata $$filter: cannot parse: $rest"))
      val colName = m.group(1)
      require(columns.contains(colName), s"odata $$filter: unknown column '$colName'")
      val op = m.group(2)
      val lit = m.group(3)
      if (lit == "null")
        out.append(s"$colName IS ${if (op == "ne") "NOT " else ""}NULL")
      else
        out.append(s"$colName ${ops(op)} $lit")
      rest = rest.drop(m.matched.length)
      first = false
    }
    require(out.nonEmpty, "odata $filter: empty expression")
    out.toString
  }

  /** $orderby: "col [asc|desc], ..." with validated columns. */
  def orderByToSql(orderby: String, columns: Set[String]): String =
    orderby
      .split(",")
      .map(_.trim)
      .filter(_.nonEmpty)
      .map { part =>
        part.split("\\s+") match {
          case Array(c) if columns.contains(c)          => c
          case Array(c, "asc") if columns.contains(c)   => c
          case Array(c, "desc") if columns.contains(c)  => s"$c DESC"
          case _ => throw new IllegalArgumentException(s"odata $$orderby: cannot parse '$part'")
        }
      }
      .mkString(", ")

  def edmType(dt: DataType): String = dt match {
    case BooleanType      => "Edm.Boolean"
    case ByteType         => "Edm.SByte"
    case ShortType        => "Edm.Int16"
    case IntegerType      => "Edm.Int32"
    case LongType         => "Edm.Int64"
    case FloatType        => "Edm.Single"
    case DoubleType       => "Edm.Double"
    case StringType       => "Edm.String"
    case BinaryType       => "Edm.Binary"
    case DateType         => "Edm.Date"
    case TimestampType    => "Edm.DateTimeOffset"
    case d: DecimalType   => "Edm.Decimal"
    case _                => "Edm.String" // complex types serialize as JSON text
  }

  /** EDMX CSDL document over every dataset with a declared schema. */
  def metadataXml(qs: QueryService): String = {
    val types = qs.knownDatasets.flatMap { name =>
      qs.schemaDdl(name).map { ddl =>
        val st = StructType.fromDDL(ddl)
        val props = st.fields
          .map(f =>
            s"""        <Property Name="${f.name}" Type="${edmType(f.dataType)}" Nullable="${f.nullable}"/>""")
          .mkString("\n")
        s"""      <EntityType Name="$name">
           |        <Key><PropertyRef Name="offset"/></Key>
           |$props
           |      </EntityType>""".stripMargin
      }
    }
    val sets = qs.knownDatasets
      .map(n => s"""          <EntitySet Name="$n" EntityType="graft.$n"/>""")
      .mkString("\n")
    s"""<?xml version="1.0" encoding="utf-8"?>
       |<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
       |  <edmx:DataServices>
       |    <Schema Namespace="graft" xmlns="http://docs.oasis-open.org/odata/ns/edm">
       |${types.mkString("\n")}
       |      <EntityContainer Name="Container">
       |$sets
       |      </EntityContainer>
       |    </Schema>
       |  </edmx:DataServices>
       |</edmx:Edmx>""".stripMargin
  }

  /** Service document: the entity-set listing. */
  def serviceDocument(qs: QueryService, baseUrl: String): String = {
    val sets = qs.knownDatasets
      .map(n => s"""{"name":"$n","kind":"EntitySet","url":"$n"}""")
      .mkString(",")
    s"""{"@odata.context":"$baseUrl/$$metadata","value":[$sets]}"""
  }

  /** Evaluate an entity-set query with the supported options. */
  def entitySet(
      qs: QueryService,
      dataset: String,
      options: Map[String, String]
  ): DataFrame = {
    val base = qs.toTable(dataset)
    val cols = base.columns.toSet
    val filtered = options.get("$filter") match {
      case Some(f) => base.filter(filterToSql(f, cols))
      case None    => base
    }
    val ordered = options.get("$orderby") match {
      case Some(o) => filtered.orderBy(orderByToSql(o, cols).split(",\\s*").map {
        case s if s.endsWith(" DESC") =>
          org.apache.spark.sql.functions.col(s.stripSuffix(" DESC")).desc
        case s => org.apache.spark.sql.functions.col(s).asc
      }.toIndexedSeq: _*)
      case None => filtered.orderBy(org.apache.spark.sql.functions.col("offset"))
    }
    val selected = options.get("$select") match {
      case Some(s) =>
        val picks = s.split(",").map(_.trim).filter(_.nonEmpty)
        picks.foreach(c => require(cols.contains(c), s"odata $$select: unknown column '$c'"))
        ordered.select(picks.head, picks.tail.toIndexedSeq: _*)
      case None => ordered
    }
    val skipped = options.get("$skip").map(_.toInt).getOrElse(0)
    val top = options.get("$top").map(_.toInt).getOrElse(100)
    selected.offset(skipped).limit(top)
  }
}
