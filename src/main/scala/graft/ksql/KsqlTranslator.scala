package graft.ksql

/** KSQL → Spark SQL SELECT translation, shared by the batch
  * ([[KsqlEngine]]) and streaming ([[KsqlStreamingEngine]]) executors.
  * Textual and total for the reference dialect: `EMIT CHANGES` stripped,
  * `UCASE`→`upper`, `COUNT_DISTINCT` → engine-chosen aggregate (exact
  * `count(DISTINCT)` in batch, the exact streaming Aggregator in
  * streaming, where Spark rejects count-distinct), `LATEST_BY_OFFSET(x)`
  * → `graft_latest_by_offset(x, stream._offset)`, ksqlDB-style
  * alias-prefixed `SELECT *` expansion.
  */
trait KsqlTranslator {

  /** STREAM/TABLE kind of a registered collection, if known. */
  protected def kindOf(name: String): Option[String]

  /** Output columns of a collection (without `_offset`). */
  protected def viewColumns(name: String): Seq[String]

  /** SQL replacement for `COUNT_DISTINCT(` — engine-specific. */
  protected def countDistinctSql: String = "count(DISTINCT "

  private val FromRe =
    ("(?is)\\bFROM\\s+(\\w+)" +
      "(?:\\s+(?!JOIN\\b|LEFT\\b|RIGHT\\b|FULL\\b|INNER\\b|OUTER\\b|ON\\b|WHERE\\b|GROUP\\b|PARTITION\\b|EMIT\\b|HAVING\\b|ORDER\\b|LIMIT\\b)(\\w+))?").r
  private val JoinRe =
    "(?is)\\bJOIN\\s+(\\w+)(?:\\s+(?!ON\\b)(\\w+))?\\s+ON\\b".r

  /** (collection name, reference-in-query) pairs from the FROM clause. */
  private[ksql] def fromSources(select: String): Seq[(String, String)] = {
    val from = FromRe.findFirstMatchIn(select).map(m =>
      (m.group(1), Option(m.group(2)).getOrElse(m.group(1))))
    val joins = JoinRe.findAllMatchIn(select).map(m =>
      (m.group(1), Option(m.group(2)).getOrElse(m.group(1)))).toSeq
    from.toSeq ++ joins
  }

  private[ksql] def translateSelect(select0: String,
      injectOffset: Boolean = false): String = {
    var s = select0.replaceAll("(?is)\\s+EMIT\\s+CHANGES\\s*$", "").trim
    s = s.replaceAll("(?i)(?<![\\w])COUNT_DISTINCT\\s*\\(",
      java.util.regex.Matcher.quoteReplacement(countDistinctSql))
    s = s.replaceAll("(?i)(?<![\\w])UCASE\\s*\\(", "upper(")
    val sources = fromSources(s)
    // LATEST_BY_OFFSET orders by the STREAM side's record offset
    if (s.toUpperCase.contains("LATEST_BY_OFFSET")) {
      val streamRef = sources
        .collectFirst { case (n, ref) if kindOf(n).contains("STREAM") => ref }
        .orElse(sources.headOption.map(_._2))
        .getOrElse(throw new IllegalArgumentException(
          s"LATEST_BY_OFFSET without a FROM source: $select0"))
      s = s.replaceAll("(?i)LATEST_BY_OFFSET\\s*\\(([^()]*)\\)",
        s"graft_latest_by_offset($$1, $streamRef._offset)")
    }
    // SELECT * expansion: single source -> declared columns; join -> each
    // side's columns prefixed with its reference (ksqlDB output naming)
    if (s.matches("(?is)^SELECT\\s+\\*\\s+FROM\\b.*")) {
      val cols = sources match {
        case Seq((name, ref)) =>
          viewColumns(name).map(c => s"$ref.$c AS $c")
        case multi => multi.flatMap { case (name, ref) =>
          viewColumns(name).map(c => s"$ref.$c AS ${ref}_$c") }
      }
      s = s.replaceFirst("(?is)^SELECT\\s+\\*", "SELECT " + cols.mkString(", "))
    }
    if (injectOffset && !s.toUpperCase.contains("GROUP BY")) {
      // derived streams carry the source offset through (Kafka offset
      // analogue) so downstream LATEST_BY_OFFSET keeps arrival order
      val ref = sources.headOption.map(_._2).getOrElse("")
      s = FromRe.replaceFirstIn(s,
        java.util.regex.Matcher.quoteReplacement(s", $ref._offset AS _offset ") + "FROM $1 $2")
    }
    s
  }
}
