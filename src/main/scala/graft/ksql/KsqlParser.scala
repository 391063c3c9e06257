package graft.ksql

import org.apache.spark.sql.types._

/** Parsed KSQL statement forms — exactly the dialect surface the reference
  * tutorial exercises (reference: files/ksqldb-cli/all.sql:1-160,
  * README.md:35-470): SET, CREATE SOURCE CONNECTOR, CREATE TABLE/STREAM
  * (declared), CSAS/CTAS, INSERT INTO … VALUES, push queries
  * (`EMIT CHANGES`), and SHOW.
  */
sealed trait KsqlStatement
final case class SetProperty(key: String, value: String) extends KsqlStatement
final case class CreateConnector(name: String, props: Map[String, String])
  extends KsqlStatement
final case class ColumnDef(name: String, dataType: DataType, isKey: Boolean)
final case class CreateCollection(kind: String, name: String,
    columns: Seq[ColumnDef], props: Map[String, String]) extends KsqlStatement
final case class CreateAsSelect(kind: String, name: String,
    props: Map[String, String], select: String, partitionBy: Option[String])
  extends KsqlStatement
final case class InsertValues(target: String, columns: Option[Seq[String]],
    values: Seq[String]) extends KsqlStatement
/** A bare SELECT. `emitFinal` = the query ended in `EMIT FINAL`
  * (windowed final results — each window emitted once, on close) rather
  * than `EMIT CHANGES` / nothing.
  */
final case class PushQuery(select: String, emitFinal: Boolean = false)
  extends KsqlStatement
final case class ShowCommand(what: String) extends KsqlStatement
final case class DescribeCommand(name: String) extends KsqlStatement
final case class ExplainCommand(select: String) extends KsqlStatement
final case class DropCollection(kind: String, name: String, ifExists: Boolean)
  extends KsqlStatement
final case class PrintTopic(topic: String) extends KsqlStatement
final case class TerminateQuery(queryId: String) extends KsqlStatement

object KsqlParser {

  /** Split a KSQL script into statements: `;` terminates outside single
    * quotes; `--` comments run to end-of-line outside quotes (the README's
    * CTAS carries inline comments).
    */
  def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0; var inQuote = false
    while (i < script.length) {
      val c = script.charAt(i)
      if (inQuote) {
        cur.append(c)
        if (c == '\'') inQuote = false
        i += 1
      } else if (c == '\'') { cur.append(c); inQuote = true; i += 1 }
      else if (c == '-' && i + 1 < script.length && script.charAt(i + 1) == '-') {
        while (i < script.length && script.charAt(i) != '\n') i += 1
      } else if (c == ';') {
        val s = cur.result().trim
        if (s.nonEmpty) out += s
        cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    val tail = cur.result().trim
    if (tail.nonEmpty) out += tail
    out.result()
  }

  private val SetRe = "(?is)^SET\\s+'([^']+)'\\s*=\\s*'([^']*)'$".r
  private val ConnectorRe =
    "(?is)^CREATE\\s+SOURCE\\s+CONNECTOR\\s+(\\w+)\\s+WITH\\s*\\((.*)\\)$".r
  // WITH is optional (ksqlDB defaults the topic to the collection name)
  private val CreateAsRe =
    "(?is)^CREATE\\s+(TABLE|STREAM)\\s+(\\w+)\\s+(?:WITH\\s*\\((.*?)\\)\\s+)?AS\\s+(SELECT\\b.*)$".r
  private val CreateDeclRe =
    "(?is)^CREATE\\s+(TABLE|STREAM)\\s+(\\w+)\\s*\\((.*)\\)\\s*WITH\\s*\\((.*)\\)$".r
  private val InsertRe =
    "(?is)^INSERT\\s+INTO\\s+(\\w+)\\s*(?:\\(([^)]*)\\)\\s*)?VALUES\\s*\\((.*)\\)$".r
  private val ShowRe = "(?is)^SHOW\\s+(\\w+)$".r
  private val DescribeRe = "(?is)^DESCRIBE\\s+(\\w+)$".r
  private val DropRe =
    "(?is)^DROP\\s+(TABLE|STREAM)\\s+(?:(IF\\s+EXISTS)\\s+)?(\\w+)$".r
  private val PrintRe =
    "(?is)^PRINT\\s+(?:'([\\w.-]+)'|([\\w.-]+))(?:\\s+FROM\\s+BEGINNING)?$".r
  private val TerminateRe = "(?is)^TERMINATE\\s+(\\w+)$".r
  private val PartitionByRe = "(?is)\\s+PARTITION\\s+BY\\s+(\\w+)\\s*$"

  def parse(statement: String): KsqlStatement = {
    val s = statement.trim
    s match {
      case SetRe(k, v) => SetProperty(k, v)
      case ConnectorRe(name, props) => CreateConnector(name, parseProps(props))
      case CreateAsRe(kind, name, props, select0) =>
        // strip EMIT CHANGES/FINAL (the reference's last CTAS carries
        // CHANGES; a CTAS is re-derived on read, so its windows converge
        // to finals either way) and a trailing PARTITION BY re-key
        // (CSAS form, all.sql:45-51)
        var select = select0
          .replaceAll("(?is)\\s+EMIT\\s+(CHANGES|FINAL)\\s*$", "").trim
        val pby = PartitionByRe.r.findFirstMatchIn(select).map(_.group(1))
        if (pby.isDefined) select = select.replaceAll(PartitionByRe, "")
        CreateAsSelect(kind.toUpperCase, name, parseProps(props), select, pby)
      case CreateDeclRe(kind, name, cols, props) =>
        CreateCollection(kind.toUpperCase, name, parseColumns(cols), parseProps(props))
      case InsertRe(target, cols, values) =>
        InsertValues(target,
          Option(cols).map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty)),
          splitTopLevel(values))
      case ShowRe(what) => ShowCommand(what.toUpperCase)
      case DescribeRe(name) => DescribeCommand(name)
      case DropRe(kind, ifExists, name) =>
        DropCollection(kind.toUpperCase, name, ifExists != null)
      case PrintRe(quoted, bare) => PrintTopic(Option(quoted).getOrElse(bare))
      case TerminateRe(qid) => TerminateQuery(qid)
      case e if e.toUpperCase.matches("(?s)EXPLAIN\\s.*") =>
        ExplainCommand(e.substring(7).trim)
      case sel if sel.toUpperCase.startsWith("SELECT") =>
        PushQuery(sel.replaceAll("(?is)\\s+EMIT\\s+(CHANGES|FINAL)\\s*$", ""),
          sel.matches("(?is).*\\sEMIT\\s+FINAL\\s*$"))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported KSQL statement: ${other.take(80)}")
    }
  }

  /** `'k' = 'v'` property lists (values may be bare numbers/booleans). */
  private[ksql] def parseProps(body: String): Map[String, String] =
    if (body == null) Map.empty // optional WITH clause: no properties
    else splitTopLevel(body).map { kv =>
      val Array(k, v) = kv.split("=", 2).map(_.trim)
      unquote(k) -> unquote(v)
    }.toMap

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1)
    else s

  /** Declared column list: `name TYPE [PRIMARY KEY|KEY]`. Types may nest
    * (`ARRAY<...>`, `MAP<K, V>`, `STRUCT<f T, ...>`), so the splitter
    * tracks angle-bracket depth alongside parens.
    */
  private[ksql] def parseColumns(body: String): Seq[ColumnDef] =
    splitAngleAware(body).map { colDef0 =>
      var colDef = colDef0.trim
      val isKey = colDef.toUpperCase.endsWith(" KEY")
      if (isKey) {
        colDef = colDef.replaceAll("(?i)\\s+PRIMARY\\s+KEY$", "")
          .replaceAll("(?i)\\s+KEY$", "").trim
      }
      val sp = colDef.indexOf(' ')
      require(sp > 0, s"column definition needs `name TYPE`: $colDef0")
      ColumnDef(colDef.take(sp), sqlType(colDef.drop(sp + 1).trim), isKey)
    }

  /** The full ksqlDB 0.15 DDL type surface, recursively. */
  private[ksql] def sqlType(t: String): DataType = {
    val up = t.toUpperCase
    if (up.startsWith("ARRAY<") && up.endsWith(">"))
      ArrayType(sqlType(t.substring(6, t.length - 1).trim))
    else if (up.startsWith("MAP<") && up.endsWith(">")) {
      val parts = splitAngleAware(t.substring(4, t.length - 1))
      require(parts.length == 2, s"MAP needs two type params: $t")
      MapType(sqlType(parts(0).trim), sqlType(parts(1).trim))
    } else if (up.startsWith("STRUCT<") && up.endsWith(">")) {
      StructType(splitAngleAware(t.substring(7, t.length - 1)).map { f =>
        val sp = f.trim.indexOf(' ')
        require(sp > 0, s"STRUCT field needs `name TYPE`: $f")
        StructField(f.trim.take(sp), sqlType(f.trim.drop(sp + 1).trim))
      })
    } else if (up.startsWith("DECIMAL")) {
      val body = t.drop("DECIMAL".length).trim
      if (body.isEmpty) DecimalType(38, 18)
      else "\\(\\s*(\\d+)\\s*(?:,\\s*(\\d+)\\s*)?\\)".r.findFirstMatchIn(body)
        .map(m => DecimalType(m.group(1).toInt,
          Option(m.group(2)).map(_.toInt).getOrElse(0)))
        .getOrElse(throw new IllegalArgumentException(
          s"malformed DECIMAL precision/scale: $t"))
    }
    else up.takeWhile(_ != '(') match {
      case "VARCHAR" | "STRING" => StringType
      case "BOOLEAN" => BooleanType
      case "INT" | "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "DOUBLE" => DoubleType
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  /** Split on commas at paren AND angle-bracket depth 0 (column/type
    * lists; `<` never appears as an operator in DDL bodies).
    */
  private[ksql] def splitAngleAware(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case c @ ('(' | '<') => depth += 1; cur.append(c)
      case c @ (')' | '>') => depth -= 1; cur.append(c)
      case ',' if depth == 0 =>
        val t = cur.result().trim; if (t.nonEmpty) out += t; cur.clear()
      case c => cur.append(c)
    }
    val t = cur.result().trim
    if (t.nonEmpty) out += t
    out.result()
  }

  /** Split on commas at paren/bracket depth 0, respecting single quotes
    * (brackets nest inside `ARRAY[...]` literals).
    */
  private[ksql] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var inQuote = false
    s.foreach {
      case c if inQuote => cur.append(c); if (c == '\'') inQuote = false
      case '\'' => cur.append('\''); inQuote = true
      case c @ ('(' | '[') => depth += 1; cur.append(c)
      case c @ (')' | ']') => depth -= 1; cur.append(c)
      case ',' if depth == 0 =>
        val t = cur.result().trim; if (t.nonEmpty) out += t; cur.clear()
      case c => cur.append(c)
    }
    val t = cur.result().trim
    if (t.nonEmpty) out += t
    out.result()
  }
}
